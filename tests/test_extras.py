import pyspark.sql.functions as F

from azuredataengineering_deeplearning_spark.operators import similarity as SIM
from azuredataengineering_deeplearning_spark.operators.scd import with_surrogate_key
from azuredataengineering_deeplearning_spark.sources.readers import read_parquet


def test_surrogate_keys_dense_and_partition_invariant(spark, sf_dir):
    c = read_parquet(spark, f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    a = with_surrogate_key(c, ["c_custkey"])
    n = a.count()
    stats = a.agg(
        F.min("surrogateKey").alias("lo"),
        F.max("surrogateKey").alias("hi"),
        F.countDistinct("surrogateKey").alias("d"),
    ).collect()[0]
    assert (stats.lo, stats.hi, stats.d) == (1, n, n)  # dense 1..N
    # repartitioned input → same assignment (determinism from total order)
    b = with_surrogate_key(c.repartition(13), ["c_custkey"])
    joined = a.join(b.withColumnRenamed("surrogateKey", "s2"), "c_custkey")
    assert joined.filter(F.col("surrogateKey") != F.col("s2")).count() == 0


def test_numpy_topk_equals_expression_topk(spark):
    e = read_parquet(spark, "/root/testdata/sf0.01/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 8)
    a = {(r.query_id, r.rank): r.neighbor_id
         for r in SIM.cosine_topk(e, q, k=5).collect()}
    b = {(r.query_id, r.rank): r.neighbor_id
         for r in SIM.numpy_topk(e, q, k=5).collect()}
    assert a == b  # two physical strategies, identical ranking
