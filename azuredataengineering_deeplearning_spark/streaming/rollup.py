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
would double-count. The applied ``batch_id`` marker is therefore part
of the state itself: an ``_applied_<batch_id>`` file is written inside
the STAGED state directory before the single ``os.rename`` that
publishes it, so state and marker become visible in one atomic step —
there is no window in which the state is swapped but unmarked.
(Parquet readers ignore ``_``-prefixed files, like ``_SUCCESS``.)
Structured Streaming replays at most the latest unacknowledged batch,
so only the newest marker is needed. A crash between "move old state
aside" and "publish new state" is healed at the next fold: the newest
``__old_*`` directory is renamed back before anything else.

The parquet swap below is the local/test sink; on object stores back
the state with Delta (MERGE per batch) and keep the same marker
discipline inside the transaction.
"""

from __future__ import annotations

import glob
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


def _recover_state(state_path: str) -> None:
    """If a prior attempt crashed after moving the live state aside but
    before publishing its replacement, put the old state back."""
    if os.path.isdir(state_path):
        return
    olds = glob.glob(f"{state_path}__old_*")
    if olds:
        newest = max(olds, key=lambda p: int(p.rsplit("_", 1)[-1]))
        os.rename(newest, state_path)
        for stale in olds:
            if stale != newest and os.path.isdir(stale):
                shutil.rmtree(stale)


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

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _recover_state(state_path)
        marker = os.path.join(state_path, f"_applied_{batch_id}")
        if os.path.exists(marker):
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
        # marker inside the staged dir -> the rename below publishes
        # state and applied-marker atomically
        with open(os.path.join(tmp, f"_applied_{batch_id}"), "w"):
            pass
        old = f"{state_path}__old_{batch_id}"
        if os.path.isdir(state_path):
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def stream_accuracy_rollup(
    stream: DataFrame,
    group_cols: Sequence[str],
    pred_col: str,
    gold_col: str,
    schema: str,
    state_path: str,
    checkpoint: str,
    allowed=None,
) -> StreamingQuery:
    """Continuously maintained evaluation scoreboard — the streaming
    face of ``lmeval.accuracy_summary`` (the reference re-scores daily
    prediction slices in a scheduled loop; here each micro-batch of
    (prediction, gold) rows folds into per-group counts with the same
    exactly-once marker discipline as :func:`stream_rollup`, so the
    scoreboard is O(batch + groups) per day, never a rescan).

    Read any time with :func:`read_accuracy_state`."""
    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark.operators.lmeval import (
        structured_output_eval,
    )

    scored = structured_output_eval(stream, pred_col, gold_col, schema, allowed)
    flat = scored.select(
        *group_cols,
        F.col("is_valid_json").cast("int").alias("__valid"),
        F.col("exact_match").cast("int").alias("__em"),
        F.when(F.col("n_items") >= 0, F.col("n_items")).alias("__items"),
        F.when(F.col("n_items") >= 0, 1).otherwise(0).alias("__items_n"),
    ).na.fill({"__items": 0})
    spec = {
        "n": ("count", None),
        "n_valid": ("sum", "__valid"),
        "n_exact": ("sum", "__em"),
        "items_sum": ("sum", "__items"),
        "items_n": ("sum", "__items_n"),
    }
    return stream_rollup(flat, group_cols, spec, state_path, checkpoint)


def read_accuracy_state(spark, state_path: str) -> DataFrame:
    """Scoreboard projection of the accuracy state: the same columns
    ``lmeval.accuracy_summary`` emits (n, valid_rate, exact_match_rate,
    mean_items) derived from the mergeable counts."""
    from pyspark.sql import functions as F

    spec = {
        "n": ("count", None),
        "n_valid": ("sum", "__valid"),
        "n_exact": ("sum", "__em"),
        "items_sum": ("sum", "__items"),
        "items_n": ("sum", "__items_n"),
    }
    from azuredataengineering_deeplearning_spark.operators.incremental import (
        finalize_state,
    )

    s = finalize_state(spark.read.parquet(state_path), spec)
    group_cols = [c for c in s.columns if c not in spec]
    return s.select(
        *group_cols,
        F.col("n"),
        (F.col("n_valid") / F.col("n")).alias("valid_rate"),
        (F.col("n_exact") / F.col("n")).alias("exact_match_rate"),
        F.when(
            F.col("items_n") > 0, F.col("items_sum") / F.col("items_n")
        ).alias("mean_items"),
    )
