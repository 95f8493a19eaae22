"""Batch readers (SURVEY §2.1 S1/S2/S11/S14).

All readers return lazy DataFrames; column pruning and row predicates are
passed through so Catalyst pushes them into the parquet scan
(``PushedFilters`` / ``ReadSchema`` visible in ``.explain``), matching the
reference's manual ``columns=[...]`` / pyarrow-filter reads
(``MachineLearning/Ray/azureml_ray_basic_functions.py:33-40``,
``MachineLearning/Ray/recsys/generate_data.py:85-93``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Memoized BASE scans, keyed by (applicationId, path). A parquet
# `spark.read.parquet` pays file listing + footer schema read every
# call; over a few hundred catalog queries that's pure overhead. The
# cached object is only the analyzed base plan — per-query
# filter/select still compose on top, so Catalyst pushdown per final
# plan is unaffected. Keyed by applicationId so a new session never
# sees another session's plans.
_scan_cache: dict[tuple[str, str], DataFrame] = {}


def _base_scan(spark: SparkSession, path: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, path)
    df = _scan_cache.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if len(_scan_cache) > 256:  # bound: long-lived sessions, many dirs
            _scan_cache.clear()
        _scan_cache[key] = df
    return df


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small driver-local rows as a DataFrame WITHOUT the pickled-RDD
    dispatch tax. ``spark.createDataFrame(list, schema)`` parallelizes
    the rows into ``defaultParallelism`` pickled partitions, and every
    downstream action then pays one Python-worker round-trip PER
    PARTITION just to deserialize a handful of rows — ~32 dispatches
    per evaluation on local[32], re-paid on every broadcast rebuild
    (measured in r14: sim_semantic_dedup's timed action anti-scaled
    0.40× going 8→32 cores on exactly this fixed cost). The pandas →
    Arrow path instead lands the batch JVM-side in ONE partition with
    zero Python workers at evaluation time. Rows pandas/Arrow cannot
    express fall back to a 1-partition pickled RDD — same semantics as
    before, 1 dispatch instead of 32."""
    rows = list(rows)
    if rows:
        try:
            import pandas as pd

            pdf = pd.DataFrame.from_records([tuple(r) for r in rows])
            return spark.createDataFrame(pdf, schema=schema)
        except Exception:
            pass  # nested/exotic types: exact-semantics fallback below
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    predicate: Column | str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Parquet scan with column prune + row filter pushed to the scan.

    Reference: ``AIO_delta_table_generator.py:29`` (S1),
    ``azureml_ray_basic_functions.py:33-40`` (S11). Spark reads a whole
    directory of parquet files natively (S14 — the reference's pandas
    concat loop collapses to one call). ``merge_schema=True`` unions
    the schemas of evolved files (added columns read as null on old
    files) — the schema-drift read path; costs a footer scan per file,
    so keep it off for stable tables.
    """
    # engine contract: wall-clock semantics are UTC (oracle compares naive
    # UTC); the hosting session may not carry the engine profile
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if path.rstrip("/").endswith("events.parquet"):
        # NANOS-vintage events need this set BEFORE the first (memoized)
        # scan of the file, whichever call path gets there first
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if merge_schema:
        # not memoized: the merged schema depends on the file set NOW
        df = spark.read.option("mergeSchema", "true").parquet(path)
    else:
        df = _base_scan(spark, path)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def read_json(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    """JSON scan with schema inference (S2, ``AIO_delta_table_generator.py:25``)."""
    return spark.read.option("multiLine", str(multiline).lower()).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch scan. Columnar like parquet: predicate pushdown,
    column pruning, and stripe-level skipping all apply — interchange
    format for Hive-era lakes the reference's Synapse tables front."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema=None,
) -> DataFrame:
    """XML scan (Spark 4 native source — the spark-xml package folded
    into core): one DataFrame row per ``row_tag`` element, schema
    inferred unless pinned. Feeds-and-speeds exports from legacy
    systems land this way; prefer explicit ``schema`` at scale (skips
    the inference pass)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
) -> DataFrame:
    """CSV batch scan; explicit schema preferred at scale (no inference pass)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def _events_with_ts(df: DataFrame) -> DataFrame:
    """Normalize the events table's timestamps across testdata vintages.

    The engine contract is two columns regardless of the parquet layout:
    ``ts`` — a session-TZ (UTC) ``timestamp`` for human-facing/time-window
    ops — and ``ts_ns`` — exact int64 epoch nanoseconds for order/arithmetic
    (sessionization, cumsum windows) matching the DuckDB oracle's
    ``epoch_ns``. Handles: TIMESTAMP(NANOS) read as int64 via
    ``spark.sql.legacy.parquet.nanosAsLong``; TIMESTAMP(MICROS) with
    isAdjustedToUTC=false inferred as ``timestamp_ntz`` (Spark 4 default);
    and plain ``timestamp``.
    """
    if "ts" not in df.columns:
        return df
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if dt == "timestamp_ntz":
        # session tz is UTC, so the cast preserves wall-clock values
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        dt = "timestamp"
    if dt == "timestamp" and "ts_ns" not in df.columns:
        df = df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    return df


def read_excel_distributed(
    spark: SparkSession,
    path_glob: str,
    schema: str,
    skiprows: int = 0,
    sheet_name: str | int = 0,
    parser=None,
) -> DataFrame:
    """S15 — Excel→DataFrame ETL, distributed (reference
    ``azurefunction_retrieve_write_datalake.py:116-128``: download
    bytes → ``pd.read_excel(io.BytesIO(...), skiprows=16,
    sheet_name='sheet1')`` → parquet, one file per function call).

    Spark shape: the ``binaryFile`` source lists and reads each
    workbook's bytes on executors (one task per file — workbooks are
    row-group-less blobs, the file is the parallelism unit), then an
    Arrow-batched ``mapInPandas`` parses each with pandas. ``schema``
    (a DDL string) is mandatory: at scale you never infer schema per
    workbook.

    The parse step needs an Excel engine (openpyxl/xlrd), which this
    container doesn't ship — with no engine and no ``parser`` override
    the call raises ImportError at PLAN BUILD, not mid-job. Pass
    ``parser`` (bytes → pandas.DataFrame) to supply a custom decoder;
    the distributed plumbing is identical and is what the tests cover.
    """
    import pandas as pd

    if parser is None:
        try:
            import openpyxl  # noqa: F401 — pd.read_excel's xlsx engine
        except ImportError as e:
            raise ImportError(
                "read_excel_distributed: no Excel engine available "
                "(openpyxl/xlrd not installed). Install one or pass "
                "parser=(bytes -> pandas.DataFrame)."
            ) from e
        import io

        def parser(raw: bytes) -> pd.DataFrame:
            return pd.read_excel(
                io.BytesIO(raw), skiprows=skiprows, sheet_name=sheet_name
            )

    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    from pyspark.sql.types import StructType, _parse_datatype_string

    out_schema = _parse_datatype_string(schema)
    assert isinstance(out_schema, StructType)

    def parse(batches):
        for pdf in batches:
            for raw in pdf["content"]:
                parsed = parser(raw)
                parsed.columns = [str(c) for c in parsed.columns]
                yield parsed[[f.name for f in out_schema.fields]]

    return files.mapInPandas(parse, out_schema)


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver testdata star schema as a dict of DataFrames."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        if name == "events":
            # runtime-settable SQL conf; the driver's own session may not
            # carry the engine profile, so set it defensively here
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _base_scan(spark, f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _events_with_ts(df)
        out[name] = df
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: Sequence[str] | None = None
) -> list[str]:
    """Register the star schema as temp views so ANSI-SQL users can run
    ``spark.sql`` directly (the engine is DataFrame-first, but the
    reference's analysts live in SQL/KQL — this is their front door).
    Views are lazy: no scan happens until a query reads them, and every
    catalog semantics (pushdown, pruning, nanos normalization on
    ``events``) rides along because the view wraps the engine reader.
    Returns the registered names."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return list(tables)
