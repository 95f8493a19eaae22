"""Join operators (SURVEY §2.3).

Strategy notes for 100 TB: dimension joins are *explicitly* broadcast
(J1) — at cluster scale the fact side never shuffles for a dim lookup.
Fact-fact joins shuffle on their keys; AQE converts to broadcast at
runtime when a side turns out small, and splits skewed partitions
(skew-join enabled in the session profile). As-of joins are expressed as
window `lag` over a single shuffle by key — not a self-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    df: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Broadcast equi-join for small dims (J1; ``spark_randomforest.py:54``)."""
    return df.join(F.broadcast(dim), on, how)


def equi_join(
    df: DataFrame,
    other: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Multi-key equi join (J2; ``salt_cumsum.py:20``)."""
    return df.join(other, on, how)


def semi_join(df: DataFrame, keys: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """Inner-join-as-filter without duplication (J3;
    ``generate_data.py:259`` merge-on-drop_duplicates → left_semi)."""
    return df.join(keys, on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """Complement of :func:`semi_join` (free in Spark; no reference analog)."""
    return df.join(keys, on, "left_anti")


def multi_join(
    base: DataFrame,
    others: Sequence[tuple[DataFrame, Column | Sequence[str], str]],
) -> DataFrame:
    """Chained multi-way join (J7; ``generate_data.py:235-245``). Catalyst
    reorders/plans; caller wraps small sides in ``F.broadcast``."""
    out = base
    for other, on, how in others:
        out = out.join(other, on, how)
    return out


def date_dim_lookup(
    fact: DataFrame,
    dim_date: DataFrame,
    date_key_columns: Sequence[str],
    date_key: str = "dateKey",
    prefix_sep: str = "_",
) -> DataFrame:
    """Star-schema date-dimension lookup per dateKey column (J4;
    ``databricks_synapse_sql_writer.py:87-99``). Each lookup broadcasts the
    calendar; sentinel keys (<= 0 — "not yet occurred"/missing) stay null,
    matching the generated ``CASE WHEN dateKey > 0`` view SQL."""
    out = fact
    for c in date_key_columns:
        renamed = dim_date.select(
            F.col(date_key).alias(f"__dk_{c}"),
            *[
                F.col(x).alias(f"{c}{prefix_sep}{x}")
                for x in dim_date.columns
                if x != date_key
            ],
        )
        out = out.join(
            F.broadcast(renamed),
            (F.col(c) > 0) & (F.col(c) == F.col(f"__dk_{c}")),
            "left",
        ).drop(f"__dk_{c}")
    return out


def asof_previous(
    df: DataFrame,
    key: Sequence[str],
    order_by: str,
    value: str,
    out: str | None = None,
) -> DataFrame:
    """Nearest-prior value per key — as-of join against own history (J8;
    ``generate_data.py:551-555`` groupby-shift). One shuffle on ``key``,
    no self-join."""
    w = Window.partitionBy(*key).orderBy(F.col(order_by))
    return df.withColumn(out or f"prev_{value}", F.lag(value).over(w))


def range_clamp(
    df: DataFrame,
    bounds: DataFrame,
    key: Sequence[str],
    ts: str,
    lo: str,
    hi: str,
) -> DataFrame:
    """Keep rows whose ``ts`` falls in per-key [lo, hi] (J9;
    ``stats_forecast_predict.py:181-202``). ``bounds`` is one row per key —
    broadcast when small, shuffle-join otherwise (Catalyst decides)."""
    return df.join(bounds, list(key), "inner").filter(
        F.col(ts).between(F.col(lo), F.col(hi))
    )
