"""Streaming deduplication (SURVEY §2.9 gap-fill; north-star dedup on
the ingest path instead of after it).

The reference dedups only in batch (``generate_data.py:116``,
``drop_duplicates``); on a continuous feed that means re-scanning the
lake. Structured Streaming's ``dropDuplicatesWithinWatermark`` drops
repeats at ingest with state bounded by the watermark horizon — the
form that survives an unbounded stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Drop duplicate rows by key, batch or streaming.

    With ``ts_col`` + ``within`` (e.g. ``"10 minutes"``): watermarked
    streaming dedup — a key is remembered for the watermark horizon and
    then forgotten, so state is O(keys per horizon), not O(all keys
    ever). Duplicates arriving later than the horizon are NOT caught;
    pick ``within`` from the source's real re-delivery window (at-least-
    once sinks re-deliver within seconds, not days). Without ``within``:
    plain ``dropDuplicates`` — exact, but on a stream its state grows
    without bound; batch callers get the ordinary exact dedup."""
    if within is not None:
        if ts_col is None:
            raise ValueError("within= requires ts_col=")
        return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return df.dropDuplicates(list(key_cols))
