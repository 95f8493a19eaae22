"""Event-time window aggregations (SURVEY §2.9 gap-fill: the reference
sessionizes only in batch; Structured Streaming gives the streaming
semantics for free).

These functions build on ``F.window`` / ``F.session_window``, which run
identically over batch and streaming DataFrames — the catalog checks
them in batch against DuckDB, the streaming tests run them with
watermarks over a file stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten(out: DataFrame, start: str, end: str) -> DataFrame:
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias(start), F.col("w.end").alias(end), *rest
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time windows (e.g. '1 hour'). With ``watermark``
    set (streaming), state for windows older than the watermark is
    dropped — bounded state at any scale."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(ts_col, duration).alias("w"), *keys).agg(*aggs)
    return _flatten(out, "window_start", "window_end")


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows (duration, slide): each event lands in
    duration/slide windows."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys).agg(*aggs)
    return _flatten(out, "window_start", "window_end")


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows with a fixed inactivity gap — the streaming twin
    of the batch gap-sessionization (W5): window end = last event + gap."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys).agg(*aggs)
    return _flatten(out, "session_start", "session_end")
