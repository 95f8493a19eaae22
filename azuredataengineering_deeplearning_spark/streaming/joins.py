"""Stream-stream and stream-static joins (SURVEY §2.9 gap-fill).

The reference joins only in batch (e.g. the Synapse writer's dim
lookups); Structured Streaming adds the online forms. Two shapes:

- **stream-static**: a streaming fact against a batch dim — Spark
  re-plans the static side per micro-batch, broadcast by size. No state,
  no watermark needed.
- **stream-stream**: both sides streaming. State is unbounded unless
  BOTH sides carry watermarks AND the join condition bounds event time
  (a range predicate between the two time columns); then Spark evicts
  state older than watermark + bound. We build that condition from a
  declarative ``within`` interval so callers can't silently create an
  unbounded-state join.

Both run identically in batch (the catalog/oracle path) and streaming
(tested over file streams with watermarks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    keys: Sequence[str],
    how: str = "left",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a streaming fact with a batch dimension. Broadcast is the
    right physical plan whenever the dim fits (re-broadcast each
    micro-batch picks up slowly-changing dims for free)."""
    right = F.broadcast(static) if broadcast_static else static
    return stream.join(right, list(keys), how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a bounded event-time
    band: ``right_ts ∈ [left_ts - within, left_ts + within]``.

    The band + watermarks make join state finite: each side buffers only
    rows younger than (watermark + within), so state size is
    rate × window, independent of total stream length — the property
    that lets this run forever at production rates. Outer joins emit
    unmatched rows only once the watermark passes the band (late-data
    completeness, same contract as windowed aggs).

    In batch mode the same function is a plain band join (watermarks are
    no-ops), which is how the correctness gate oracles it."""
    lw = left.withWatermark(left_ts, left_watermark) if left_watermark else left
    rw = right.withWatermark(right_ts, right_watermark) if right_watermark else right
    # disambiguate overlapping column names via aliases
    la, ra = lw.alias("l"), rw.alias("r")
    eq = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    band = (
        F.col(f"r.{right_ts}")
        >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}")
    ) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
    )
    cond = band
    for e in eq:
        cond = e & cond
    out = la.join(ra, cond, how)
    # project joined keys once (streaming joins keep both sides' columns);
    # outer joins need coalesce — the unmatched side's key is null
    if how == "inner":
        keep = [F.col(f"l.{k}").alias(k) for k in keys]
    else:
        keep = [F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys]
    lcols = [F.col(f"l.{c}").alias(c) for c in lw.columns if c not in keys]
    rcols = [
        F.col(f"r.{c}").alias(c if c not in lw.columns else f"{c}_r")
        for c in rw.columns
        if c not in keys
    ]
    return out.select(*keep, *lcols, *rcols)


def stream_temporal_enrich(
    stream: DataFrame,
    dim_path: str,
    keys,
    fact_date_key: str,
    checkpoint: str,
    sink_fn,
    prefix: str = "dim_",
):
    """Streaming SCD2 enrichment: every micro-batch of facts joins the
    dimension version IN FORCE AT THE FACT'S DATE — the as-of fact-dim
    join (`scd2_temporal_join`) run per batch via ``foreachBatch``,
    with the dimension RE-READ each batch so upserts land mid-stream
    (the static side of a stream-static join is otherwise planned
    once). ``sink_fn(enriched_df, batch_id)`` receives the result.

    Scale: the dim scan per batch is the price of freshness; at 100 TB
    dims, snapshot the current+recent versions to a compact table and
    point ``dim_path`` there."""
    from azuredataengineering_deeplearning_spark.operators.scd import (
        scd2_temporal_join,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.parquet(dim_path)
        out = scd2_temporal_join(
            batch_df, dim, list(keys), fact_date_key, prefix=prefix
        )
        sink_fn(out, batch_id)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
