"""Multi-dimensional grouping + reshaping (SURVEY §2.4 note: the
reference never uses cube/rollup/pivot — Spark gives them free, so the
engine exposes them as named operators; the one-hot encoder (D7) is the
reference's hand-rolled pivot).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Hierarchical subtotals: (k1,k2), (k1), () — one pass, partial
    aggregation per grouping set."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All 2^n grouping sets."""
    return df.cube(*keys).agg(*aggs)


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Long → wide: one column per pivot value. ``values`` is required —
    pinning it skips Spark's extra distinct-scan job AND fixes the output
    schema (the 100 TB discipline; unpinned pivots also explode on
    high-cardinality columns)."""
    return df.groupBy(*keys).pivot(pivot_col, list(values)).agg(agg)


def intersect_rows(a: DataFrame, b: DataFrame, all_rows: bool = False) -> DataFrame:
    """Set intersection (distinct or bag semantics)."""
    return a.intersectAll(b) if all_rows else a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, all_rows: bool = False) -> DataFrame:
    """Set difference (distinct or bag semantics)."""
    return a.exceptAll(b) if all_rows else a.subtract(b)


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (pandas ``melt`` / SQL UNPIVOT): one output row per
    (id row, value column). Native ``unpivot`` — a map-side stack
    expression, no shuffle, no UDF; the inverse of :func:`pivot_agg`."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)


def grouping_sets_agg(
    df: DataFrame,
    sets: Sequence[Sequence[str]],
    aggs: Sequence[Column],
) -> DataFrame:
    """Arbitrary GROUPING SETS (the general form of rollup/cube): one
    aggregation computing exactly the requested grain combinations —
    Spark expands to a single Expand + one shuffle, NOT one job per
    grain. Keys absent from a set come back null (standard SQL
    semantics)."""
    all_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in all_keys:
                all_keys.append(k)
    return df.groupingSets(
        [list(s) for s in sets], *[F.col(k) for k in all_keys]
    ).agg(*aggs)
