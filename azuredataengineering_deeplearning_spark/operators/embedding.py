"""Embedding-column generation via Arrow-batched pandas UDFs (D2;
reference ``parallel_sentence_embedding_databricks.py:3-59``).

The canonical pattern: broadcast a (possibly large) model once per
executor, run a ``pandas_udf`` Series→Series over Arrow batches, return
``array<float>``. The container has no torch/transformers, so the
default model is a deterministic hash-projection embedder — the
*plumbing* (broadcast, batch shape, null passthrough, schema) is
identical to a real sentence-transformer deployment; swap the model
object to go live.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


class HashProjectionModel:
    """Deterministic stand-in encoder: token hashes folded into a
    fixed-dim vector, L2-normalized. Picklable → broadcastable."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def encode(self, texts):
        import math

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            v = [0.0] * self.dim
            for tok in str(t).split():
                # portable FNV fold (python hash() is salted per process)
                acc = 2166136261
                for ch in tok.encode():
                    acc = (acc ^ ch) * 16777619 % (1 << 32)
                v[acc % self.dim] += ((acc >> 8) % 1000) / 1000.0
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / n for x in v])
        return out


def embed_column(
    df: DataFrame,
    text_col: str,
    out: str = "embedding",
    model=None,
) -> DataFrame:
    """Attach an embedding column via broadcast model + pandas_udf
    (D2 pattern). NULL text → NULL embedding (null passthrough,
    ``parallel_sentence_embedding_databricks.py:40-44``)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(model or HashProjectionModel())

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(s: pd.Series) -> pd.Series:
        m = bc.value  # deserialized once per executor, reused per batch
        return pd.Series(m.encode(s.tolist()))

    return df.withColumn(out, _embed(F.col(text_col)))


def flatten_json_array_udf(col: Column | str, sentinel: str = "NULL") -> Column:
    """D1: the reference's row UDF — JSON array of objects → one joined
    string with sentinel handling
    (``parallel_sentence_embedding_databricks.py:10-33``). Kept as a
    *row UDF* deliberately to document the pattern; prefer
    :func:`flatten_json_array_native` in production (JVM-side, ~10-100x
    cheaper)."""
    import json

    from pyspark.sql.types import StringType

    @F.udf(StringType())
    def _flatten(payload):
        if payload is None:
            return sentinel
        try:
            items = json.loads(payload)
        except (ValueError, TypeError):
            return sentinel
        if not isinstance(items, list):
            return sentinel
        parts = []
        for obj in items:
            if isinstance(obj, dict):
                parts.append(" ".join(f"{k}: {v}" for k, v in obj.items()))
        return " | ".join(parts) if parts else sentinel

    c = F.col(col) if isinstance(col, str) else col
    return _flatten(c)


def flatten_json_array_native(
    col: Column | str, element_schema: str, fields: list[str], sentinel: str = "NULL"
) -> Column:
    """D1 done right: same semantics as the row UDF, pure expressions —
    ``from_json`` → ``transform``/``concat_ws`` — stays inside
    whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.from_json(c, f"array<struct<{element_schema}>>")
    joined = F.array_join(
        F.transform(
            arr,
            lambda o: F.concat_ws(
                " ", *[F.concat_ws(": ", F.lit(f), o[f].cast("string")) for f in fields]
            ),
        ),
        " | ",
    )
    return F.when(
        arr.isNull() | (F.size(arr) == 0), F.lit(sentinel)
    ).otherwise(joined)


def embedding_profile(df, vec_col: str = "embedding", dim_out: str = "dim"):
    """Per-dimension statistics of an embedding column: mean and mean
    square for every vector position, plus the dimension's value count —
    the drift/health profile you run before trusting 10^9 vectors
    (collapsed dimensions, scale shifts after a model swap, truncated
    writes all show up here).

    Shape at scale: ``posexplode`` fans each vector into (dim, value)
    pairs that partial-aggregate map-side, so the shuffle carries only
    ``n_partitions × dims`` rows. Sums accumulate in DECIMAL(30,15)
    (order-independent — bit-identical to the DuckDB oracle; see
    ``functions.exact``)."""
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias(dim_out, "__v")
    )
    # square in DOUBLE per-row (IEEE-identical across engines), cast the
    # product to decimal for the order-independent SUM — the proven
    # oracle-lockstep recipe from catalog/similarity._sq_sum_sql
    return (
        exploded.groupBy(dim_out)
        .agg(
            F.count("__v").alias("n"),
            F.sum(F.col("__v").cast("decimal(30,15)")).cast("double").alias("sum_v"),
            F.sum(
                (F.col("__v") * F.col("__v")).cast("decimal(30,15)")
            ).cast("double").alias("sum_sq"),
        )
        .select(
            F.col(dim_out).cast("int").alias(dim_out),
            "n",
            (F.col("sum_v") / F.col("n")).alias("mean_v"),
            (F.col("sum_sq") / F.col("n")).alias("mean_sq"),
        )
    )
