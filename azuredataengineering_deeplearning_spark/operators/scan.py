"""Sequential pattern matching over ordered event streams — the engine
behind KQL's ``scan`` operator (dialect subset, see sources/kql.py).

Reference parity: the reference's telemetry pipelines detect multi-step
ticket/device state sequences in Kusto (the ``scan``/``partition``
family adjacent to ``daily_eval.py:158``'s revision queries); this
module re-expresses the core single-active-match semantics Spark-first.

Semantics (documented dialect, pinned in tests/test_scan_operator.py):
greedy, single-active, non-overlapping sequence matching. Rows are
visited in the given order within each key group, driving a state
machine over the K step predicates:

- state ``j`` means steps ``0..j-1`` matched; the FIRST subsequent row
  satisfying step ``j``'s predicate advances the state (each step
  matches exactly one row; rows satisfying earlier steps are ignored
  while a sequence is open — Kusto's full ``scan`` keeps concurrent
  matches and per-step runs, which this subset deliberately drops);
- completing step ``K-1`` closes the match: its K rows are emitted
  with a per-key 0-based ``match_id``, and the machine resets to idle;
- rows not part of a completed match are dropped (Kusto emits only
  matched rows when every step is unconditional-output, as here).

For K = 2 these semantics have a closed form — step-2 row matches the
FIRST step-1 row after the previous step-2 row — which is what the
catalog row's DuckDB oracle exploits (any step-2 row forces the
machine idle, matched or not).

Scale shape: predicates are compiled JVM-side into boolean columns
(whole-stage codegen; arbitrary Spark SQL expressions). The sequential
pass itself is inherently ordered, so it runs per key group via
``grouped_apply_packed`` (one hash shuffle on the keys, packed Arrow
batches, AQE-coalescing-proof explicit fan-out); per-group cost is one
numpy/python pass over that group's rows. A scan WITHOUT keys is a
single sequential task by definition (same as Kusto's serialized
engine) — supported, but the keyed form is the 100-TB path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scan_steps(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[tuple[str, bool]],
    steps: Sequence[Column],
    match_col: str = "match_id",
) -> DataFrame:
    """Emit rows participating in completed step sequences.

    ``order_by``: [(column_name, ascending), ...] — the serialized
    order within each key group (ties make the row visit order, and
    therefore matching, nondeterministic — same caveat as KQL
    ``serialize``). ``steps``: one boolean Column per step (nulls are
    non-matches). Output = the input columns + ``match_col`` (long,
    0-based per key group, in match-completion order)."""
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        grouped_apply_packed,
    )

    if not steps:
        raise ValueError("scan_steps needs at least one step predicate")
    if not order_by:
        raise ValueError("scan_steps needs an explicit order_by")
    import numpy as np

    k = len(steps)
    orig = df.columns
    pred_cols = [f"__scanp{i}" for i in range(k)]
    work = df.select(
        "*",
        *[
            F.coalesce(p.cast("boolean"), F.lit(False)).alias(pc)
            for p, pc in zip(steps, pred_cols)
        ],
    )
    drop_key = False
    if not keys:
        work = work.withColumn("__scank", F.lit(0))
        keys = ["__scank"]
        drop_key = True
    names = [c for c, _ in order_by]
    ascending = [asc for _, asc in order_by]

    out_schema = T.StructType(
        [f for f in work.schema.fields if f.name not in pred_cols]
        + [T.StructField(match_col, T.LongType(), True)]
    )
    keep_cols = [f.name for f in work.schema.fields if f.name not in pred_cols]

    def matcher(g):
        g = g.sort_values(
            by=names, ascending=ascending, kind="mergesort"
        ).reset_index(drop=True)
        preds = [
            g[pc].to_numpy(dtype=bool, na_value=False) for pc in pred_cols
        ]
        n = len(g)
        mid = np.full(n, -1, dtype=np.int64)
        nxt, m, cur = 0, 0, []
        for i in range(n):
            if preds[nxt][i]:
                cur.append(i)
                if nxt == k - 1:
                    for r in cur:
                        mid[r] = m
                    m += 1
                    cur, nxt = [], 0
                else:
                    nxt += 1
        sel = mid >= 0
        out = g.loc[sel, keep_cols].copy()
        out[match_col] = mid[sel]
        return out

    result = grouped_apply_packed(work, list(keys), matcher, out_schema)
    return result.drop("__scank") if drop_key else result
