"""Incremental file ingest (SURVEY §2.9 T1-T4; reference
``DataEngineering/DataBricks/spark_stream.py:12-33``).

The reference uses Databricks Auto Loader (``cloudFiles`` CSV source,
5 GB/trigger, schema evolution, retry-wrapped notebook). The OSS
translation: the Structured Streaming file source with
``maxFilesPerTrigger`` rate limiting (OSS has no byte-based trigger —
documented delta), ``_metadata.file_path`` lineage instead of
``input_file_name`` (the streaming-safe form), a partition token parsed
from the path, checkpointed exactly-once append, and a restart loop in
the runner rather than tenacity around a notebook.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_file_ingest(
    spark: SparkSession,
    source_glob: str,
    schema,
    checkpoint: str,
    out_path: str,
    fmt: str = "csv",
    out_fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    path_partition_index: int | None = None,
) -> StreamingQuery:
    """CSV/JSON landing-zone → lake append with lineage columns.

    T1: incremental discovery + rate limit; T3: checkpointed append
    (exactly-once across restarts); lineage: ``sourceFile`` +
    ``partitionName`` parsed from path position
    (``spark_stream.py:21-26``). Schema is explicit — at 100 TB schema
    inference per microbatch is a non-starter; drift is handled by the
    restart-with-merged-schema loop in the runner (T2)."""
    reader = spark.readStream.format(fmt).schema(schema).option("header", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(source_glob)
    df = df.withColumn("sourceFile", F.col("_metadata.file_path"))
    if path_partition_index is not None:
        df = df.withColumn(
            "partitionName",
            F.split(
                F.split(F.col("sourceFile"), "/").getItem(path_partition_index), "_"
            ).getItem(0),
        )
    return (
        df.writeStream.format(out_fmt)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start(out_path)
    )


def run_until_drained(query: StreamingQuery, timeout_sec: float = 60.0) -> None:
    """Process everything currently available, then stop — the batch-ish
    drive used by tests and backfills (T4's restart loop calls this)."""
    query.processAllAvailable()
    query.stop()
    deadline = time.time() + timeout_sec
    while query.isActive and time.time() < deadline:
        time.sleep(0.1)
