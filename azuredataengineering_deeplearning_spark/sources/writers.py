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
from pyspark.sql import functions as F

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
    dynamic_overwrite: bool = False,
) -> None:
    """Parquet sink with explicit output sizing (S4 analog on OSS).

    ``dynamic_overwrite=True`` (with ``partition_by`` + mode
    'overwrite') replaces ONLY the partitions present in ``df`` — the
    idempotent daily-reload pattern: re-running a day's load rewrites
    that day's partition and leaves history untouched, instead of
    truncating the whole table."""
    writer = _sized(df, target_files).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, target_files: int | None = None) -> None:
    """JSONL export (S18). The reference serializes rows via
    ``df.rdd.map(json.dumps)`` (``spark_data_generating.py:70-73``); the
    native JSON sink is the distributed, codegen'd equivalent."""
    _sized(df, target_files).write.mode("overwrite").json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """ORC sink (zlib default) with the same output-sizing discipline as
    :func:`write_parquet` — the Hive-ecosystem interchange path."""
    writer = _sized(df, target_files).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    target_files: int | None = None,
) -> None:
    """XML sink (Spark 4 native) — interchange with XML-consuming legacy
    feeds; same output-sizing discipline as the other sinks."""
    (
        _sized(df, target_files)
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", row_tag)
        .save(path)
    )


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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout — the OSS stand-in for Delta
    OPTIMIZE ZORDER on one sort dimension set. ``repartitionByRange``
    puts disjoint key ranges in separate files and
    ``sortWithinPartitions`` orders rows inside each, so parquet
    row-group min/max stats become tight and selective scans skip whole
    files (the data-skipping the reference gets from Delta;
    SURVEY §4 'Data skipping by timestamp predicate')."""
    parts = target_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, *[F.col(c) for c in cluster_by])
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 256,
    compression: str = "snappy",
) -> int:
    """Small-file compaction for plain parquet directories (the S20
    maintenance op when Delta isn't in play): rewrite the directory into
    ceil(bytes / target_file_mb) files. Returns the new file count.
    Rewrites in place via a temp sibling + atomic-ish rename — at lake
    scale, compact per partition directory instead so each rewrite is
    bounded."""
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compact_tmp"
    (
        spark.read.parquet(path)
        .coalesce(n_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(tmp)
    )
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table (``bucketBy`` + ``saveAsTable``) —
    the pre-shuffle lever for 100-TB fact tables: two tables bucketed on
    the same key with the same bucket count join WITHOUT any exchange
    (each bucket pair joins locally), and repeated aggregations on the
    bucket key skip their shuffle too. Pay the shuffle once at write
    time, never at read time. ``sort_by`` additionally orders rows
    inside each bucket file (sort-merge join without the sort)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table_name)


def expire_partitions(
    path: str,
    keep: int,
    partition_col: str | None = None,
) -> list[str]:
    """Retention sweep for date/key-partitioned parquet directories: keep
    the ``keep`` lexicographically-largest partition directories (works
    for ``col=yyyy-MM-dd`` layouts, where lexicographic = chronological)
    and delete the rest. Returns the deleted partition names. The
    plain-parquet analog of Delta VACUUM-by-retention — bounded work:
    one directory listing + per-partition deletes, no data scan."""
    import os
    import shutil

    parts = sorted(
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
        and "=" in d
        and (partition_col is None or d.split("=", 1)[0] == partition_col)
    )
    doomed = parts[:-keep] if keep > 0 else parts
    for d in doomed:
        shutil.rmtree(os.path.join(path, d))
    return doomed


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of non-negative integer columns into
    one long sort key: bit i of column j lands at position
    ``i * n_cols + j``. Range-clustering on this key keeps files tight
    on EVERY input dimension simultaneously — the multi-column
    data-skipping layout Delta's OPTIMIZE ZORDER provides, as a pure
    column expression (portable bit arithmetic, cross-engine checkable).
    Inputs must already be scaled to [0, 2^bits); see
    :func:`operators.aggregates.bucket_by_bounds` or modulo binning."""
    n = len(cols)
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-dimension clustered layout: range-partition + sort by the
    Morton key of ``zorder_by`` (columns pre-scaled to [0, 2^bits)).
    Files become locality blocks in every listed dimension, so
    predicates on ANY of them skip most files — where single-key range
    clustering only skips on its leading column."""
    key = zorder_key(zorder_by, bits).alias("__z")
    parts = target_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__z", key)
        .repartitionByRange(parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_skipping_report(path: str, column: str, lo, hi) -> dict:
    """Data-skipping audit: how many parquet files a range predicate on
    ``column`` would skip, from footer min/max statistics alone (the
    same stats Catalyst/Delta use). Metadata-only — no row data is read;
    O(files) driver work, the 100 TB-safe shape for a layout check.

    Returns ``{n_files, n_skipped, rows_total, rows_skipped}``. Run it
    after :func:`write_clustered` / :func:`write_zordered` to verify the
    layout actually localizes the clustered columns (a well-clustered
    table skips most files for a narrow range; a random layout skips
    none). Files lacking stats count as not skippable (scanned)."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    files = sorted(
        _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_skipped = rows_total = rows_skipped = 0
    for f in files:
        md = _pq.ParquetFile(f).metadata
        rows = md.num_rows
        rows_total += rows
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col_idx = None
            for i in range(md.num_columns):
                if md.row_group(rg).column(i).path_in_schema == column:
                    col_idx = i
                    break
            if col_idx is None:
                break
            st = md.row_group(rg).column(col_idx).statistics
            if st is None or not st.has_min_max:
                break
            mins.append(st.min)
            maxs.append(st.max)
        else:
            if mins and (max(maxs) < lo or min(mins) > hi):
                n_skipped += 1
                rows_skipped += rows
    return {
        "n_files": len(files),
        "n_skipped": n_skipped,
        "rows_total": rows_total,
        "rows_skipped": rows_skipped,
    }
