"""Streaming incremental rollup: continuously maintained gold
aggregates via ``foreachBatch`` + the mergeable states of
``operators.incremental``.

Each micro-batch is partial-aggregated (map-side combined over the
batch only) and merged into the persisted state — per batch the work is
O(batch + state), never O(all facts ever seen). This is the streaming
face of ``incremental.incremental_update``; the final state equals a
batch recompute over everything ingested (decimal-accumulated sums make
merge order irrelevant — tested).

Exactly-once for an ADDITIVE sink needs more than the checkpoint: a
replayed micro-batch (crash between state write and checkpoint commit)
would double-count. Each applied ``batch_id`` therefore leaves a marker
under ``<state>__applied/``; a replay of a marked batch is a no-op.
Markers are tied to one checkpoint lineage — wiping the checkpoint
without wiping markers and state restarts numbering at 0 and must start
from an empty state dir.

The parquet swap below is the local/test sink; on object stores back
the state with Delta (MERGE per batch) and keep the same marker
discipline inside the transaction.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from azuredataengineering_deeplearning_spark.operators.incremental import (
    AggSpec,
    aggregate_batch,
    merge_states,
)


def stream_rollup(
    stream: DataFrame,
    keys: Sequence[str],
    spec: AggSpec,
    state_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Start a streaming query folding every micro-batch into the
    aggregate state at ``state_path``. Read the state any time with
    ``spark.read.parquet`` + ``incremental.finalize_state``."""
    spark = stream.sparkSession
    markers = f"{state_path}__applied"

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(markers, str(batch_id))
        if os.path.isdir(marker):
            return  # replayed batch after a crash: already applied
        batch_agg = aggregate_batch(batch_df, keys, spec)
        if os.path.isdir(state_path):
            state = merge_states(
                [spark.read.parquet(state_path), batch_agg], keys, spec
            )
        else:
            state = batch_agg
        tmp = f"{state_path}__staging_{batch_id}"
        state.write.mode("overwrite").parquet(tmp)
        old = f"{state_path}__old_{batch_id}"
        if os.path.isdir(state_path):
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.makedirs(marker, exist_ok=True)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )
