"""JSON / array expression helpers (SURVEY §2.8 F19-F20).

The reference round-trips JSON through Python (``json.loads`` /
``json.dumps``, ``generate_data.py:150-203``; row-UDF array flatten,
``parallel_sentence_embedding_databricks.py:10-33``). Here every shape is
a built-in expression: ``get_json_object``/``from_json`` parse on the
JVM, array concat is ``flatten(collect_list)``, serialization is
``to_json(struct(...))``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def json_get(col: Column | str, path: str) -> Column:
    """F19: extract a scalar from a JSON string (``json.loads`` + key)."""
    return F.get_json_object(_c(col), path)


def json_parse(col: Column | str, schema: str) -> Column:
    """F19: full parse with a declared schema (``from_json``)."""
    return F.from_json(_c(col), schema)


def json_serialize(*cols: str) -> Column:
    """F19: re-serialize columns as a JSON object (``json.dumps`` analog)."""
    return F.to_json(F.struct(*cols))


def variant_parse(col: Column | str, safe: bool = True) -> Column:
    """F19 (Spark 4 path): parse a JSON string into a VariantType value —
    binary-encoded semi-structured storage, so repeated path extraction
    skips re-tokenizing the text (the engine's answer to schema-on-read
    payload columns at scale). ``safe`` maps malformed JSON to NULL
    instead of failing the job under ANSI mode."""
    return F.try_parse_json(_c(col)) if safe else F.parse_json(_c(col))


def variant_extract(col: Column | str, path: str, dtype: str) -> Column:
    """F19 (Spark 4 path): typed path extraction from a variant value;
    missing paths / uncastable values → NULL (``try_variant_get``)."""
    return F.try_variant_get(_c(col), path, dtype)


def combine_json_arrays(
    df: DataFrame,
    keys: Sequence[str],
    json_array_col: str,
    element_schema: str,
    out: str = "combined",
) -> DataFrame:
    """F19: per-group concatenation of JSON arrays
    (``generate_data.py:152-175``): parse each row's JSON array, gather
    per group, flatten, re-serialize. One shuffle on ``keys``."""
    parsed = df.withColumn(
        "__arr", F.from_json(_c(json_array_col), f"array<{element_schema}>")
    )
    return parsed.groupBy(*keys).agg(
        F.to_json(F.flatten(F.collect_list("__arr"))).alias(out)
    )


def array_element(col: Column | str, index: int) -> Column:
    """F20: array index → scalar column
    (``count_target_onehot_encoder_spark.py:186-193`` vector explode)."""
    return _c(col).getItem(index)


def array_to_columns(df: DataFrame, col: str, n: int, prefix: str) -> DataFrame:
    """F20: explode a fixed-width array into n scalar columns in one
    projection."""
    return df.withColumns(
        {f"{prefix}{i}": _c(col).getItem(i) for i in range(n)}
    )


def infer_json_schema(df: DataFrame, col: str, sample_rows: int = 1000):
    """Infer a Spark schema for a JSON-string column from a bounded
    sample (the schema-on-read discipline of the reference's
    ``spark.read.json`` ingests, applied to an embedded column).

    Reads ``sample_rows`` non-null values through ``spark.read.json``'s
    inference — the sample is executor-side; only the resulting
    StructType (scalar-sized) reaches the driver. At 100 TB a fixed
    sample is the only sane schema probe; pass the result to
    :func:`parse_json_column` and route rows that fail the inferred
    schema via ``options={'mode': 'PERMISSIVE'}`` corrupt-record
    handling.
    """
    sample = df.select(_c(col).alias("j")).filter(F.col("j").isNotNull()).limit(
        sample_rows
    )
    return df.sparkSession.read.json(sample.rdd.map(lambda r: r["j"])).schema


def parse_json_column(
    df: DataFrame,
    col: str,
    schema=None,
    out: str | None = None,
    sample_rows: int = 1000,
) -> DataFrame:
    """Parse a JSON-string column into a typed struct, inferring the
    schema from a sample when none is declared."""
    sch = schema or infer_json_schema(df, col, sample_rows)
    return df.withColumn(out or f"{col}_parsed", F.from_json(_c(col), sch))
