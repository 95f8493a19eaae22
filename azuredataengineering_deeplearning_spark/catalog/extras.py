"""Catalog: numpy mapInPandas top-k + deterministic surrogate keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import ORACLES, query
from azuredataengineering_deeplearning_spark.operators import similarity as SIM
from azuredataengineering_deeplearning_spark.operators.scd import with_surrogate_key
from azuredataengineering_deeplearning_spark.sources.readers import read_parquet


@query("sim_numpy_topk", None)
def sim_numpy_topk(spark, sf_dir):
    """D10 broadcast-index pattern: numpy GEMM per Arrow batch, partial
    top-k per partition, global merge. Same oracle as the expression
    path (registered below) — two completely different physical plans,
    one answer."""
    e = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    return SIM.numpy_topk(e, q, k=10)


# reuse the brute-force oracle: both strategies must give identical top-k
ORACLES["sim_numpy_topk"] = ORACLES["sim_cosine_topk"]


@query(
    "scd_surrogate_keys",
    """
    SELECT c_custkey, CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS surrogateKey
    FROM customer
    """,
)
def scd_surrogate_keys(spark, sf_dir):
    """Deterministic dense identity 1..N — range-partitioned numbering +
    offset join (never a single-task global window)."""
    c = read_parquet(spark, f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return with_surrogate_key(c, ["c_custkey"]).select("c_custkey", "surrogateKey")
