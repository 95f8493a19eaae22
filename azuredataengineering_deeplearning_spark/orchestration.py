"""Driver-side orchestration: bounded parallelism + retry policy.

The reference fans child notebooks out on a 4-thread pool
(``parallelize_db_notebooks.py:12-37``), pushes 3 warehouse tables
concurrently with tenacity exponential backoff
(``databricks_synapse_sql_writer.py:367-388``), and wraps the streaming
notebook in a retry decorator (``spark_stream.py:1-10``). This module is
that control plane, dependency-free: Spark jobs submitted from separate
threads run concurrently on the same scheduler (FAIR/FIFO per config).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Mapping
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field


@dataclass
class RetryPolicy:
    """Exponential backoff with jitter (tenacity ``wait_random_exponential``
    shape: the reference uses 15-45 s x2 for warehouse loads)."""

    attempts: int = 3
    base_delay: float = 1.0
    max_delay: float = 60.0
    backoff: float = 2.0
    jitter: float = 0.1
    retry_on: tuple[type[BaseException], ...] = (Exception,)

    def delays(self):
        d = self.base_delay
        for _ in range(self.attempts - 1):
            yield min(d, self.max_delay) * (1 + random.uniform(-self.jitter, self.jitter))
            d *= self.backoff


def with_retry(fn: Callable, policy: RetryPolicy | None = None):
    """Wrap a callable with the retry policy; re-raises the final error."""
    policy = policy or RetryPolicy()

    def run(*args, **kwargs):
        delays = policy.delays()
        for attempt in range(1, policy.attempts + 1):
            try:
                return fn(*args, **kwargs)
            except policy.retry_on:
                if attempt >= policy.attempts:
                    raise  # the original error, after the last attempt
                time.sleep(next(delays, 0.0))
        return None  # unreachable

    return run


@dataclass
class TaskResult:
    name: str
    ok: bool
    result: object = None
    error: BaseException | None = None
    elapsed_sec: float = 0.0
    attempts_used: int = 1


def run_parallel(
    tasks: Mapping[str, Callable[[], object]],
    max_workers: int = 4,
    policy: RetryPolicy | None = None,
    fail_fast: bool = False,
) -> dict[str, TaskResult]:
    """Run named thunks on a bounded thread pool with per-task retry —
    the parallel-notebook / parallel-export pattern. Returns a result
    per task; with ``fail_fast`` the first failure raises after letting
    in-flight tasks finish."""
    out: dict[str, TaskResult] = {}

    def run_one(name: str, thunk: Callable[[], object]) -> TaskResult:
        t0 = time.time()
        attempts = 0

        def counted():
            nonlocal attempts
            attempts += 1
            return thunk()

        try:
            result = with_retry(counted, policy)()
            return TaskResult(name, True, result, None, time.time() - t0, attempts)
        except BaseException as e:  # noqa: BLE001 — report, don't mask
            return TaskResult(name, False, None, e, time.time() - t0, attempts)

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {pool.submit(run_one, n, t): n for n, t in tasks.items()}
        for fut in as_completed(futures):
            res = fut.result()
            out[res.name] = res
    if fail_fast:
        failed = [r for r in out.values() if not r.ok]
        if failed:
            raise RuntimeError(
                f"{len(failed)} task(s) failed: {[f.name for f in failed]}"
            ) from failed[0].error
    return out


def backfill_partitions(
    spark,
    build_fn: Callable,
    path: str,
    part_col: str,
    partitions: list,
    max_workers: int = 4,
    policy: RetryPolicy | None = None,
) -> dict[str, "TaskResult"]:
    """Idempotent partition backfill: for each partition value, build its
    DataFrame (``build_fn(spark, value)``) and land it with DYNAMIC
    partition overwrite — a re-run (or a retry after a mid-flight
    failure) replaces ONLY that partition, never truncating the table.
    Partitions run on the bounded pool with per-partition retry — the
    reference's parallel-notebook pattern applied to the classic
    "reload these N days" operation.

    Safety: each build's rows are filtered to its own partition value,
    so a buggy ``build_fn`` can never cross-contaminate a neighboring
    partition."""
    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark.sources.writers import (
        write_parquet,
    )

    def make(value):
        def task():
            df = build_fn(spark, value).filter(F.col(part_col) == value)
            write_parquet(
                df,
                path,
                partition_by=[part_col],
                dynamic_overwrite=True,
            )
            return value

        return task

    return run_parallel(
        {str(v): make(v) for v in partitions},
        max_workers=max_workers,
        policy=policy,
    )
