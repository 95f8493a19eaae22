"""Query catalog — the correctness contract of the engine.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable built from engine operators)
and, where ANSI-SQL-expressible, the equivalent DuckDB oracle SQL. The
driver harness runs both sides at sf=0.01 and hash-compares.

Conventions (so the order-insensitive value-hash matches):
- every computed column is aliased identically on both sides;
- double aggregates go through ``functions.exact`` (decimal accumulation);
- events timestamps compare as exact int64 nanoseconds (``ts_ns`` /
  DuckDB ``epoch_ns(ts)``) because Spark truncates parquet NANOS to micros.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a catalog query and its optional DuckDB oracle.

    Duplicate names are an ERROR (round 13): a second registration
    from a different function would silently shadow the first — a
    near-miss this round, where a redundant chunker row replaced the
    existing ``t_chunk_overlap`` and its oracle without any signal.
    Same-function re-registration (module re-import) stays allowed."""

    def deco(fn):
        prev = QUERIES.get(name)
        if prev is not None and (
            prev.__module__,
            prev.__qualname__,
        ) != (fn.__module__, fn.__qualname__):
            raise ValueError(
                f"duplicate catalog query name {name!r}: already"
                f" registered by {prev.__module__}.{prev.__qualname__}"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every catalog module (side effect: registration)."""
    from azuredataengineering_deeplearning_spark.catalog import (  # noqa: F401
        core,
    )
    for mod in (
        "aggregates",
        "functions_scalar",
        "windows",
        "joins",
        "setops",
        "text",
        "similarity",
        "timeseries",
        "scd",
        "profile",
        "graph",
        "stream_batch",
        "multimodal",
        "coverage",
        "tpch_shapes",
        "tpch_more",
        "tpch_complete",
        "pipelines",
        "grouping",
        "kql",
        "extras",
        "extras2",
        "incremental",
        "pysource",
        "geo",
    ):
        try:
            __import__(f"azuredataengineering_deeplearning_spark.catalog.{mod}")
        except ModuleNotFoundError:
            pass  # module lands in a later milestone
