"""Incremental corpus re-scoring over the change data feed.

The reference's ``daily_eval.py:118-183`` re-scores a daily slice: pull
the last-N-days revisions from Kusto (``arg_max(Rev,*) by TicketId``),
clean, score every row with a pinned model, land the results. At 100 TB
the "pull a time slice and re-score it" pattern is wasteful — most of
the slice didn't change. The Spark-first replacement consumes the
source table's CHANGE FEED instead: only inserted/updated documents are
re-scored, and results merge into a scores table keyed like the source
— per day the work is O(changed docs), never O(corpus).

Pipeline per micro-batch (``foreachBatch`` over
:func:`sources.txlog.stream_changes`):

1. keep ``insert`` / ``update_postimage`` rows (preimages and deletes
   carry no new content to score);
2. a micro-batch may span several source commits, so each key keeps
   only its NEWEST image (``argmax _commit_version`` — the streaming
   face of the reference's ``arg_max(Rev,*) by TicketId``);
3. apply the caller's ``score`` transformation — a plain
   ``DataFrame -> DataFrame`` built from engine operators (quality
   rules, DSIR ratios, a broadcast-model pandas_udf…), fitted/pinned
   offline exactly like the reference pins its model checkpoint;
4. txlog-MERGE into the scores table carrying ``batch_id`` in the
   commit record — a replayed batch (crash between sink commit and
   checkpoint ack) is detected by the applied-id scan and skipped, the
   ``txnAppId``/``txnVersion`` idempotent-writer pattern.

Determinism contract: ``score`` must be row-wise deterministic given
its pinned state (no per-batch corpus statistics), which makes the
streamed scores table equal a batch re-score of the final snapshot —
asserted in ``tests/test_streaming_stateful.py``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def rescore_changes(
    changes: DataFrame,
    keys: Sequence[str],
    score: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """The per-batch transformation, exposed for batch use/testing:
    filter to fresh images, keep each key's newest, score."""
    from azuredataengineering_deeplearning_spark.operators.aggregates import (
        argmax_rows,
    )

    fresh = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    )
    if "_commit_version" in fresh.columns:
        fresh = argmax_rows(fresh, keys=list(keys), order="_commit_version")
    return score(fresh.drop("_change_type", "_commit_version"))


def stream_rescore(
    spark: SparkSession,
    source_path: str,
    change_schema,
    keys: Sequence[str],
    score: Callable[[DataFrame], DataFrame],
    scores_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """Tail ``source_path``'s CDF and maintain ``scores_path`` =
    ``score`` applied to every current document, incrementally.

    ``change_schema`` is the source's base schema plus
    ``_change_type string, _commit_version int`` (the txlog CDF file
    schema — the version stamp is embedded in every change file so this
    stream can dedup multi-commit batches). ``score`` must keep the
    ``keys`` columns in its output. Returns the started
    StreamingQuery."""
    from azuredataengineering_deeplearning_spark.sources import txlog as TX

    changes = TX.stream_changes(spark, source_path, change_schema)
    keys = list(keys)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        import os

        applied = {
            c.get("batch_id")
            for v in TX._versions(scores_path)
            for c in [TX._read_commit(scores_path, v)]
        }
        if batch_id in applied:
            return  # replayed batch: already merged
        scored = rescore_changes(batch_df, keys, score)
        if scored.isEmpty():
            return  # nothing fresh in this batch (e.g. preimages only)
        if not os.path.isdir(os.path.join(scores_path, "_txlog")):
            TX.append(scored, scores_path, meta={"batch_id": batch_id})
            return
        TX.merge(
            batch_df.sparkSession,
            scores_path,
            scored,
            keys,
            meta={"batch_id": batch_id},
        )

    return (
        changes.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
