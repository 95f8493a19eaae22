"""Profiling-driven schema operators (P7/P10; reference
``DataEngineering/DataBricks/discover_schema.py``).

Both profilers run ONE aggregate over the data (all columns in a single
pass, map-side combined), collect a scalar-sized result to the driver,
and derive a plan (casts / classifications) applied as one projection —
the 100 TB-safe shape: never per-column jobs, never row data on the
driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_BOUNDS = [
    ("tinyint", -128, 127),
    ("smallint", -32768, 32767),
    ("int", -2147483648, 2147483647),
    ("bigint", -(2**63), 2**63 - 1),
]


def plan_shrink_types(df: DataFrame, columns: Sequence[str] | None = None) -> dict[str, str]:
    """P7 planning: smallest integer type per column by observed min/max
    (``discover_schema.py:40-48`` downcast discipline). One aggregate."""
    num_cols = columns or [
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in ("int", "bigint", "smallint", "long", "integer")
    ]
    if not num_cols:
        return {}
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in num_cols],
        *[F.max(c).alias(f"hi_{c}") for c in num_cols],
    ).collect()[0]
    plan: dict[str, str] = {}
    for c in num_cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None:  # all-NULL column → smallest type
            plan[c] = "tinyint"
            continue
        for t, tlo, thi in _INT_BOUNDS:
            if lo >= tlo and hi <= thi:
                plan[c] = t
                break
    return plan


def shrink_types(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """P7: apply the downcast plan in one projection (cuts shuffle width
    — the reference's motivation for the whole exercise)."""
    plan = plan_shrink_types(df, columns)
    return df.withColumns({c: F.col(c).cast(t) for c, t in plan.items()})


def classify_columns(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    categorical_ratio: float = 0.05,
) -> DataFrame:
    """P10: binary / categorical / continuous classification by
    cardinality (``discover_schema.py:76-106``: binary = 2 distinct,
    categorical when distinct/rows < ratio). Returns a tiny DataFrame
    (column, n_distinct, n_rows, class) built from one aggregate —
    swap ``approx_count_distinct`` in at scale."""
    cols = columns or df.columns
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.countDistinct(c).alias(c) for c in cols],
    ).collect()[0]
    n = row["__n"]
    spark = df.sparkSession
    data = []
    for c in cols:
        d = row[c]
        if d <= 2:
            cls = "binary"
        elif d / max(n, 1) < categorical_ratio:
            cls = "categorical"
        else:
            cls = "continuous"
        data.append((c, d, n, cls))
    return spark.createDataFrame(
        data, "column string, n_distinct bigint, n_rows bigint, class string"
    )
