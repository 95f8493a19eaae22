"""Streaming changeset upsert: the reference's full ingest lifecycle
(landing files → SCD2 Silver) as ONE streaming query.

The reference runs these as two scheduled jobs: Auto Loader append to
Bronze (``spark_stream.py:12-33``) then a generated ``MERGE INTO``
Silver (``merge_generator.py:123-206``). ``foreachBatch`` fuses them:
each micro-batch of changeset rows is merged transactionally into the
target with the same row fates as ``operators.merge.apply_changeset``.

Scale path: with delta-spark on the cluster the merge goes through
``apply_changeset_delta`` (file-level data skipping, no full rewrite).
The parquet fallback below rewrites the target per batch — correct and
exactly-once, but meant for local tests and small dims only; it is the
OSS stand-in, not the 100-TB path.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from azuredataengineering_deeplearning_spark.operators.merge import (
    apply_changeset,
    initial_load,
)


def stream_upsert(
    changes: DataFrame,
    target_path: str,
    natural_key: Sequence[str],
    change_ts: str,
    checkpoint: str,
    compare_cols: Sequence[str] | None = None,
) -> StreamingQuery:
    """Start a streaming query that SCD2-merges each micro-batch of
    ``changes`` into the parquet table at ``target_path``.

    First batch bootstraps the target via ``initial_load`` if the path
    does not exist. Replays of a committed batch are no-ops by SCD2
    semantics (unchanged rows pass through), so checkpoint restarts stay
    exactly-once at the table level."""
    spark = changes.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Dedup within the batch: latest change per key wins (a batch can
        # carry several revisions of one key; merge expects one).
        latest = _latest_per_key(batch_df, natural_key, change_ts)
        if not os.path.isdir(target_path):
            out = initial_load(latest, natural_key, change_ts)
        else:
            target = spark.read.parquet(target_path)
            out = apply_changeset(
                target, latest, natural_key, change_ts, compare_cols
            )
        tmp = f"{target_path}__staging_{batch_id}"
        out.write.mode("overwrite").parquet(tmp)
        old = f"{target_path}__old_{batch_id}"
        if os.path.isdir(target_path):
            os.rename(target_path, old)
        os.rename(tmp, target_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    return (
        changes.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _latest_per_key(
    df: DataFrame, natural_key: Sequence[str], change_ts: str
) -> DataFrame:
    """argmax-per-key (A9 pattern) — the newest revision of each key in
    the micro-batch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*natural_key).orderBy(F.col(change_ts).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_upsert_txlog(
    stream,
    table_path: str,
    keys: list[str],
    checkpoint: str,
):
    """Streaming upsert into a transaction-logged parquet table —
    exactly-once WITHOUT a side-channel marker: each micro-batch commits
    as ONE txlog MERGE carrying its ``batch_id`` in the commit record,
    and a replayed batch (crash between sink commit and checkpoint
    acknowledgment) is detected by scanning the log for its id and
    skipped — the applied-marker discipline of the rollup sink, unified
    into the table's own log (the Delta ``txnAppId``/``txnVersion``
    idempotent-writer pattern).

    Each micro-batch must carry at most one row per key (txlog MERGE
    rejects duplicate-key changesets, matching Delta) — dedup upstream
    with e.g. a windowed latest-row-per-key before the sink.

    Returns the started StreamingQuery."""
    from azuredataengineering_deeplearning_spark.sources import txlog as TX

    def fold(batch_df, batch_id: int) -> None:
        import os

        applied = {
            c.get("batch_id")
            for v in TX._versions(table_path)
            for c in [TX._read_commit(table_path, v)]
        }
        if batch_id in applied:
            return  # replayed batch: already committed
        spark = batch_df.sparkSession
        if not os.path.isdir(os.path.join(table_path, "_txlog")):
            # bootstrap append records batch_id too, so a replay of the
            # FIRST batch is detected by the applied-id scan instead of
            # re-running as a merge (which would emit a spurious CDF
            # commit for change-feed consumers)
            TX.append(batch_df, table_path, meta={"batch_id": batch_id})
            return
        TX.merge(spark, table_path, batch_df, keys, meta={"batch_id": batch_id})

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
