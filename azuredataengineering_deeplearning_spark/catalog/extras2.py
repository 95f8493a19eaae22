"""Catalog: class weights, discover-schema composite, Q13 shape,
anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.operators import joins as J
from azuredataengineering_deeplearning_spark.operators import profile as P
from azuredataengineering_deeplearning_spark.operators.relational import (
    normalize_null_sentinel,
)
from azuredataengineering_deeplearning_spark.functions.mathx import with_null_masks
from azuredataengineering_deeplearning_spark.sources.readers import load_tables, read_parquet


@query(
    "ml_class_weights",
    """
    WITH c AS (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY 1),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS k FROM c)
    SELECT o_orderkey,
           CAST(t.total AS DOUBLE) / (t.k * c.n) AS class_weight
    FROM orders JOIN c USING (o_orderstatus) CROSS JOIN t
    """,
)
def ml_class_weights(spark, sf_dir):
    """Balanced class weights total/(k·count) attached per row — the
    RandomForest prep (``spark_randomforest.py:31-54``): tiny counts
    aggregate broadcast back onto the fact table."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    counts = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("__n"))
    totals = counts.agg(
        F.sum("__n").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "o_orderstatus",
        (F.col("__total").cast("double") / (F.col("__k") * F.col("__n"))).alias(
            "class_weight"
        ),
    )
    return J.broadcast_join(o, weights, ["o_orderstatus"], "inner").select(
        "o_orderkey", "class_weight"
    )


@query(
    "pipeline_discover_schema",
    """
    SELECT doc_id,
           CASE WHEN lang = 'en' THEN NULL ELSE lang END AS lang_clean,
           CASE WHEN (CASE WHEN lang = 'en' THEN NULL ELSE lang END) IS NULL
                THEN 0 ELSE 1 END AS lang_clean_attnmask,
           CAST(n_chars AS SMALLINT) AS n_chars_small
    FROM documents
    """,
)
def pipeline_discover_schema(spark, sf_dir):
    """``discover_schema.py`` end-to-end: sentinel→NULL, attention
    masks, profile-driven downcast — one projection (the single-select
    idiom, ``discover_schema.py:59-67``)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    d = d.withColumn("lang_clean", F.col("lang"))
    d = normalize_null_sentinel(d, ["lang_clean"], sentinel="en")
    d = with_null_masks(d, ["lang_clean"])
    d = d.withColumn(
        "lang_clean_attnmask", F.col("lang_clean_attnmask").cast("int")
    )
    shrunk = P.shrink_types(d, ["n_chars"])
    return shrunk.select(
        "doc_id",
        "lang_clean",
        "lang_clean_attnmask",
        F.col("n_chars").alias("n_chars_small"),
    )


@query(
    "q13_customer_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join survives empty groups, then a
    second aggregation over the first's result."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "j_anti_join",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (
      SELECT l_suppkey FROM lineitem WHERE l_extendedprice > 104900
    )
    """,
)
def j_anti_join(spark, sf_dir):
    """Anti join: suppliers with no top-price line items (the
    complement of the semi-join query)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    keys = t["lineitem"].filter(F.col("l_extendedprice") > 104900).select("l_suppkey")
    return J.anti_join(
        t["supplier"], keys, F.col("s_suppkey") == F.col("l_suppkey")
    ).select("s_suppkey", "s_name")


_ZBITS = 8


def _zorder_oracle_sql() -> str:
    # fully parenthesized: DuckDB's bitwise precedence differs from C
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(((( o_custkey % 256) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((o_orderkey % 256) >> {i}) & 1) << {2 * i + 1})")
    return (
        "SELECT o_orderkey, CAST(" + " + ".join(terms) + " AS BIGINT) AS zkey"
        " FROM orders"
    )


@query("lake_zorder_key", _zorder_oracle_sql())
def lake_zorder_key(spark, sf_dir):
    """Morton (Z-order) interleave key over two scaled dimensions —
    the multi-column clustering sort key (pure bit arithmetic,
    bit-identical cross-engine)."""
    from azuredataengineering_deeplearning_spark.sources.writers import zorder_key

    t = load_tables(spark, sf_dir, ["orders"])
    return t["orders"].select(
        "o_orderkey",
        zorder_key([F.col("o_custkey") % 256, F.col("o_orderkey") % 256], bits=_ZBITS)
        .alias("zkey"),
    )


@query("ml_rf_train_score")  # fitted-model output → rows-only
def ml_rf_train_score(spark, sf_dir):
    """The reference's full RandomForest chain executed distributed
    (``spark_randomforest.py:17-70``): balanced class weights, vector
    assembly, seeded 20-tree fit on order features, map-side scoring —
    output is the per-class prediction histogram (stable schema,
    seeded model)."""
    from azuredataengineering_deeplearning_spark.operators import ml as ML

    o = (
        read_parquet(
            spark, f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
        )
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .withColumn("order_doy", F.dayofyear("o_orderdate").cast("double"))
    )
    feats = ["o_totalprice", "order_doy"]
    model, si = ML.fit_random_forest(
        o, feats, "o_orderstatus", num_trees=20, max_depth=5
    )
    scored = ML.predict(model, si, o, feats)
    return (
        scored.groupBy("predicted_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
