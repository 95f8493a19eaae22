"""Catalog: set ops, sampling, dedup, splits U1-U10.

Seeded-random ops (U4/U5/U7/U9) have no cross-engine oracle — Spark's
XORShiftRandom stream differs from DuckDB's — so they register without
oracle SQL (driver records a rows-only check) and their invariants are
pytest-asserted instead (counts, fold ranges, split disjointness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.operators import setops as U
from azuredataengineering_deeplearning_spark.sources.readers import load_tables, read_parquet


@query(
    "u1_union_fold",
    """
    SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, 'done' AS bucket FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, 'partial' AS bucket FROM orders WHERE o_orderstatus = 'P'
    """,
)
def u1_union_fold(spark, sf_dir):
    """U1: reduce-union of many frames (``spark_data_generating.py:36-43``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    parts = [
        o.filter(F.col("o_orderstatus") == s).select(
            "o_orderkey", F.lit(tag).alias("bucket")
        )
        for s, tag in [("O", "open"), ("F", "done"), ("P", "partial")]
    ]
    return U.union_all(parts)


@query(
    "u2_union_by_name_missing",
    """
    SELECT c_custkey AS entity_key, c_acctbal AS acctbal, c_mktsegment AS segment
    FROM customer
    UNION ALL BY NAME
    SELECT s_suppkey AS entity_key, s_acctbal AS acctbal, NULL AS segment
    FROM supplier
    """,
)
def u2_union_by_name_missing(spark, sf_dir):
    """U2: schema-reconciling union; supplier lacks ``segment`` → NULL
    (``scale_features.py:29-31`` allowMissingColumns)."""
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    c = t["customer"].select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = t["supplier"].select(
        F.col("s_suppkey").alias("entity_key"), F.col("s_acctbal").alias("acctbal")
    )
    return U.union_by_name_missing([c, s])


@query("u4_sample_fraction")  # seeded RNG differs across engines → rows-only
def u4_sample_fraction(spark, sf_dir):
    """U4: seeded fraction sample (rows-only driver check; count tested
    in pytest within binomial bounds)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    return U.sample_fraction(o, 0.25, seed=42).select("o_orderkey")


@query("u5_mixture_sample")  # seeded → rows-only
def u5_mixture_sample(spark, sf_dir):
    """U5: proportional mixture to a target size
    (``spark_data_generating.py:46-67``)."""
    t = load_tables(spark, sf_dir, ["orders"])
    sources = {
        "open": t["orders"].filter(F.col("o_orderstatus") == "O"),
        "done": t["orders"].filter(F.col("o_orderstatus") == "F"),
    }
    return U.mixture_sample(
        sources, {"open": 0.7, "done": 0.3}, target_rows=1000, seed=42
    ).select("o_orderkey", "o_orderstatus")


@query(
    "u6_shuffle_rows",
    "SELECT o_orderkey, o_custkey FROM orders",  # order-insensitive hash ⇒ shuffle ≡ identity
)
def u6_shuffle_rows(spark, sf_dir):
    """U6: seeded full shuffle — same multiset of rows, new order (the
    order-insensitive oracle hash proves content preservation)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    return U.shuffle_rows(o, seed=42)


@query("u7_rand_fold")  # seeded → rows-only
def u7_rand_fold(spark, sf_dir):
    """U7: random fold assignment (``…encoder_spark.py:110``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    return U.rand_fold(o, 10, seed=42).select("o_orderkey", "fold")


@query(
    "u8_dedup_exact",
    "SELECT DISTINCT lang, source FROM documents",
)
def u8_dedup_exact(spark, sf_dir):
    """U8: exact dedup on a key subset."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return U.dedup_exact(d, ["lang", "source"])


@query("u9_group_split")  # seeded → rows-only
def u9_group_split(spark, sf_dir):
    """U9: leakage-free group split 80/10/10 by user
    (``generate_data.py:433-477``)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return U.group_split(ev, "user_id", [0.8, 0.1, 0.1], seed=42).select(
        "event_id", "user_id", "split"
    )


@query(
    "u10_reverse_groups",
    """
    WITH l AS (
      SELECT user_id,
             list_reverse(list(event_id ORDER BY epoch_ns(ts), event_id)) AS lst
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(i - 1 AS INT) AS pos, lst[CAST(i AS INT)] AS event_id
    FROM l, LATERAL (SELECT unnest(generate_series(1, len(lst))) AS i) g
    """,
)
def u10_reverse_groups(spark, sf_dir):
    """U10: per-group sequence inversion augmentation
    (``generate_data.py:24-42``)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return U.reverse_groups(
        ev, ["user_id"], "ts_ns", "event_id", pos="pos", out="event_id"
    )

_HB = "CAST(concat('0x', substr(md5(CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT) % {n}"


@query(
    "u_hash_sample",
    f"SELECT o_orderkey FROM orders WHERE {_HB.format(k='o_orderkey', n=10000)} < 2500",
)
def u_hash_sample(spark, sf_dir):
    """Deterministic 25% sample by key hash — the reproducible,
    engine-portable sibling of U4 (full oracle check, unlike seeded RNG)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    return U.hash_sample(o, "o_orderkey", 0.25).select("o_orderkey")


@query(
    "u_hash_fold",
    f"SELECT o_orderkey, CAST({_HB.format(k='o_orderkey', n=10)} AS INT) AS fold FROM orders",
)
def u_hash_fold(spark, sf_dir):
    """Deterministic fold assignment (hash % n) — group-safe, stable
    across engines/retries (full oracle check)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    return U.hash_fold(o, "o_orderkey", 10).select("o_orderkey", "fold")


@query(
    "u_hash_group_split",
    f"""
    SELECT event_id, user_id,
           CAST(CASE WHEN {_HB.format(k='user_id', n=10000)} < 8000 THEN 0
                     WHEN {_HB.format(k='user_id', n=10000)} < 9000 THEN 1
                     ELSE 2 END AS INT) AS split
    FROM events
    """,
)
def u_hash_group_split(spark, sf_dir):
    """Leakage-free deterministic 80/10/10 split by user-key hash —
    map-only (no distinct+join like U9), fully oracle-checked."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return U.hash_group_split(ev, "user_id", [0.8, 0.1, 0.1]).select(
        "event_id", "user_id", "split"
    )


@query("u_stratified_sample")  # seeded RNG differs across engines → rows-only
def u_stratified_sample(spark, sf_dir):
    """Per-stratum seeded sampling (sampleBy): language-balanced corpus
    draw — downsample dominant 'en', keep the rest (rates tested in
    pytest within binomial bounds)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return U.stratified_sample(
        d, "lang", {"en": 0.2, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    ).select("doc_id", "lang")


@query(
    "u_hash_topk_sample",
    """
    SELECT o_orderkey FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)) LIMIT 500
    """,
)
def u_hash_topk_sample(spark, sf_dir):
    """Exact-500-row deterministic sample (smallest key hashes) —
    reproducible reservoir sampling as a TakeOrdered plan."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    return U.hash_topk_sample(o, "o_orderkey", 500).select("o_orderkey")


@query(
    "u_hash_weighted_sample",
    f"""
    WITH q AS (
      SELECT doc_id, n_chars / 600.0 AS w FROM documents
    )
    SELECT doc_id FROM q
    WHERE {_HB.format(k='doc_id', n=10000)} < CAST(w * 10000 AS BIGINT)
    """,
)
def u_hash_weighted_sample(spark, sf_dir):
    """Per-row-probability deterministic sampling: keep probability
    proportional to document length (stand-in for a quality weight) —
    map-only, reproducible, fully oracle-checked."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return U.hash_weighted_sample(
        d, "doc_id", F.col("n_chars") / 600.0
    ).select("doc_id")


@query(
    "u_stratified_fixed",
    """
    SELECT o_orderkey, o_orderstatus FROM (
      SELECT o_orderkey, o_orderstatus,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT),
                        o_orderkey
             ) AS r
      FROM orders
    ) WHERE r <= 20
    """,
)
def u_stratified_fixed(spark, sf_dir):
    """Deterministic stratified sample: exactly 20 orders per status by
    portable hash rank — the engine-reproducible eval-set draw."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    return U.stratified_fixed_sample(
        o, "o_orderstatus", "o_orderkey", 20
    ).select("o_orderkey", "o_orderstatus")
