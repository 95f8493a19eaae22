"""Sinks: parquet / JSONL / Delta with output-file sizing (SURVEY §2.1).

The reference controls output file counts by hand
(``spark_partitions.txt:1-8``, ``spark_data_generating.py:67-73``:
``repartition``/``coalesce`` + ``maxRecordsPerFile``). Here that is one
helper: callers state a target file size and the writer derives the
partitioning — at 100 TB this is what keeps object stores from drowning
in small files.

Delta-specific paths (OPTIMIZE/VACUUM/DEEP CLONE, S20/S21) are gated on
``delta-spark`` being importable; this container has parquet only, so the
same API falls back to parquet and the maintenance ops no-op with a
warning.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

try:  # pragma: no cover - environment-dependent
    from delta.tables import DeltaTable  # noqa: F401

    HAS_DELTA = True
except Exception:  # ModuleNotFoundError locally
    HAS_DELTA = False


def _sized(df: DataFrame, target_files: int | None) -> DataFrame:
    if target_files is None:
        return df
    # coalesce when shrinking (no shuffle); repartition when growing
    n = df.rdd.getNumPartitions()
    return df.coalesce(target_files) if target_files <= n else df.repartition(target_files)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink with explicit output sizing (S4 analog on OSS)."""
    writer = _sized(df, target_files).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, target_files: int | None = None) -> None:
    """JSONL export (S18). The reference serializes rows via
    ``df.rdd.map(json.dumps)`` (``spark_data_generating.py:70-73``); the
    native JSON sink is the distributed, codegen'd equivalent."""
    _sized(df, target_files).write.mode("overwrite").json(path)


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    overwrite_schema: bool = False,
    merge_schema: bool = False,
) -> None:
    """Delta write with schema-evolution options (S4,
    ``MachineLearning/Spark/scale_features.py:29-34``). Falls back to
    parquet when delta-spark is absent (this container)."""
    writer = df.write.mode(mode)
    if HAS_DELTA:
        writer = writer.format("delta")
        if overwrite_schema:
            writer = writer.option("overwriteSchema", "true")
        if merge_schema:
            writer = writer.option("mergeSchema", "true")
        writer.save(path)
    else:
        warnings.warn("delta-spark not installed; writing parquet instead", stacklevel=2)
        writer.parquet(path)


def optimize_table(spark, path: str, zorder_by: list[str] | None = None) -> None:
    """Delta OPTIMIZE compaction (S20, ``autocompact_delta.py:4-10``)."""
    if not HAS_DELTA:
        warnings.warn("delta-spark not installed; OPTIMIZE skipped", stacklevel=2)
        return
    from delta.tables import DeltaTable

    t = DeltaTable.forPath(spark, path)
    if zorder_by:
        t.optimize().executeZOrderBy(*zorder_by)
    else:
        t.optimize().executeCompaction()


def vacuum_table(spark, path: str, retention_hours: float = 168.0) -> None:
    """Delta VACUUM (S20, ``scale_features.py:40-46``)."""
    if not HAS_DELTA:
        warnings.warn("delta-spark not installed; VACUUM skipped", stacklevel=2)
        return
    from delta.tables import DeltaTable

    DeltaTable.forPath(spark, path).vacuum(retention_hours)
