"""Structured Streaming: incremental ingest + windowed/session aggs."""

from azuredataengineering_deeplearning_spark.streaming.ingest import (
    files_per_trigger_for_bytes,
    stream_file_ingest,
    stream_file_ingest_bytes,
    run_until_drained,
)
from azuredataengineering_deeplearning_spark.streaming.windows import (
    tumbling_agg,
    sliding_agg,
    session_agg,
)
from azuredataengineering_deeplearning_spark.streaming.stateful import (
    sessionize_stream,
)
from azuredataengineering_deeplearning_spark.streaming.rollup import (
    read_accuracy_state,
    stream_accuracy_rollup,
    stream_rollup,
)
from azuredataengineering_deeplearning_spark.streaming.upsert import stream_upsert
from azuredataengineering_deeplearning_spark.streaming.dedup import stream_dedup

__all__ = [
    "files_per_trigger_for_bytes",
    "stream_dedup",
    "stream_file_ingest",
    "stream_file_ingest_bytes",
    "run_until_drained",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "sessionize_stream",
    "read_accuracy_state",
    "stream_accuracy_rollup",
    "stream_rollup",
    "stream_upsert",
]
