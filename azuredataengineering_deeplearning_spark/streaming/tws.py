"""Arbitrary stateful streaming via transformWithStateInPandas (Spark 4).

The engine's first stateful operators (`streaming.stateful` sessionizer)
use `applyInPandasWithState`; this module adopts its successor API for
the two shapes the older operator can't express cleanly:

- **lifetime running aggregates** that survive query *restarts* and are
  emitted incrementally per micro-batch (the streaming twin of the
  fit-and-carry cumulative features in
  ``MachineLearning/Ray/recsys/generate_data.py:596-622`` — state is the
  carried fit, micro-batches are the apply);
- **seen-key dedup with TTL-bounded state**: `dropDuplicates` on a
  stream grows state forever and `dropDuplicatesWithinWatermark` ties
  retention to event time; TTL state expires by *processing* time, the
  contract an ingestion pipeline actually wants for replay windows
  (state size = keys seen in the TTL window, independent of stream age).

Scale: state is partitioned by grouping key (RocksDB-backed on a
cluster), micro-batch rows reach Python as Arrow blocks, and each key's
state is O(1) for stats / O(keys-in-TTL) for dedup.

Capability gate: the transformWithState Python worker talks to the JVM
state server over protobuf; when ``google.protobuf`` isn't installed
(this sandbox) the wrappers raise at plan build with a clear message and
the processors remain unit-testable against a fake handle — same
honesty pattern as the Delta-native merge path.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STATS_STATE_SCHEMA = "cnt bigint, total double, mn double, mx double"


def tws_available() -> bool:
    """True when the transformWithState python runtime can start (its
    state-server protocol needs the protobuf package)."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _require_tws() -> None:
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "for the Python state-server protocol; install protobuf (it "
            "ships with Spark distributions' python deps) to run this "
            "operator. The StatefulProcessor classes themselves are "
            "pure pandas and unit-testable without it."
        )


class RunningEntityStats(StatefulProcessor):
    """Per-key lifetime count/sum/mean/min/max in a ValueState row.

    Emits one row per key per micro-batch that touched the key
    (Update mode); the state row is the entire memory footprint."""

    def __init__(self, value_col: str):
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", STATS_STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cnt, total, mn, mx = (
            tuple(self._agg.get()) if self._agg.exists() else (0, 0.0, None, None)
        )
        for pdf in rows:
            v = pdf[self.value_col].dropna()
            if len(v) == 0:
                continue
            cnt += int(len(v))
            total += float(v.sum())
            bmn, bmx = float(v.min()), float(v.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        if cnt == 0:
            return
        self._agg.update((cnt, total, mn, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "cnt": [cnt],
                "total": [total],
                "mean": [total / cnt],
                "mn": [mn],
                "mx": [mx],
            }
        )

    def close(self) -> None:
        pass


def streaming_entity_stats(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Lifetime per-entity stats over a stream; restart-safe (state in
    the checkpoint). Output: key, cnt, total, mean, mn, mx."""
    _require_tws()
    return stream.groupBy(key_col).transformWithStateInPandas(
        RunningEntityStats(value_col),
        outputStructType=(
            "key string, cnt bigint, total double, mean double, "
            "mn double, mx double"
        ),
        outputMode="Update",
        timeMode="None",
    )


class SeenKeyDedup(StatefulProcessor):
    """First occurrence of each key passes; repeats are dropped while
    the key's marker is alive. TTL expires markers by processing time,
    so state is bounded by the key arrival rate × TTL window."""

    def __init__(self, payload_cols: Sequence[str], ttl_ms: int | None):
        self.payload_cols = list(payload_cols)
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "marker tinyint", self.ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        first = None
        for pdf in rows:
            if len(pdf):
                first = pdf.iloc[[0]][self.payload_cols]
                break
        if first is None:
            return
        self._seen.update((1,))
        yield first

    def close(self) -> None:
        pass


def streaming_dedup_ttl(
    stream: DataFrame,
    key_cols: Sequence[str],
    output_schema: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup with TTL-bounded state: emit each key's
    first-seen row, forget the key ``ttl_ms`` after last write.
    ``output_schema`` is the DDL of the emitted payload columns."""
    _require_tws()
    payload = [f.strip().split()[0] for f in output_schema.split(",")]
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        SeenKeyDedup(payload, ttl_ms),
        outputStructType=output_schema,
        outputMode="Append",
        # state TTL is a processing-time feature; without TTL the state
        # clock is unused
        timeMode="ProcessingTime" if ttl_ms else "None",
    )
