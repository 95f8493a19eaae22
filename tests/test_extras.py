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


def test_quantile_buckets_balanced(spark, sf_dir):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A
    from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = A.quantile_buckets(d, "n_chars", 4, keys=["lang"], tiebreak=["doc_id"])
    import pyspark.sql.functions as F

    sizes = out.groupBy("lang", "bucket").count().collect()
    by_lang = {}
    for r in sizes:
        by_lang.setdefault(r.lang, []).append(r["count"])
    for lang, counts in by_lang.items():
        assert len(counts) == 4
        assert max(counts) - min(counts) <= 1  # ntile balance property


def test_hll_cardinality_accuracy_and_merge(spark, sf_dir):
    import pyspark.sql.functions as F

    from azuredataengineering_deeplearning_spark.operators import aggregates as A
    from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    est = {
        r.o_orderpriority: r.approx_distinct
        for r in A.hll_cardinality(o, ["o_orderpriority"], "o_custkey").collect()
    }
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.05, (k, est[k], n)
    # mergeability: per-shard sketches unioned == one-pass estimate
    shards = A.sketch_cardinality(
        o.withColumn("shard", F.col("o_orderkey") % 4),
        ["o_orderpriority", "shard"], "o_custkey",
    )
    merged = {
        r.o_orderpriority: r.est
        for r in shards.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("est"))
        .collect()
    }
    assert merged == est


def test_expectations_quarantine_and_metrics(spark):
    import pyspark.sql.functions as F

    from azuredataengineering_deeplearning_spark.operators.profile import (
        expectation_metrics,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 100.0)], "id int, amt double"
    )
    checks = {
        "amt_positive": F.col("amt") > 0,
        "amt_set": F.col("amt").isNotNull(),
    }
    good, bad = quarantine_split(df, checks)
    assert {r.id for r in good.collect()} == {1, 4}
    bad_rows = {r.id: sorted(r.violations) for r in bad.collect()}
    assert bad_rows == {2: ["amt_positive"], 3: ["amt_positive", "amt_set"]}
    # NULL check result counted as failure (row 3 fails amt_positive too)
    m = {r.check: (r.n_failed, round(r.fail_rate, 3)) for r in
         expectation_metrics(df, checks).collect()}
    assert m == {"amt_positive": (2, 0.5), "amt_set": (1, 0.25)}


def test_histogram_edges_and_total(spark):
    import pyspark.sql.functions as F

    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    df = spark.createDataFrame([(float(v),) for v in [-5, 0, 9.9, 10, 55, 120]], "x double")
    out = {r.bin: (r.bin_lo, r.n) for r in A.histogram(df, "x", 10, 0.0, 100.0).collect()}
    # -5 clamps into bin 0; 120 clamps into bin 9; 10 goes to bin 1
    assert out[0] == (0.0, 3) and out[1] == (10.0, 1)
    assert out[5] == (50.0, 1) and out[9] == (90.0, 1)
    assert sum(n for _, n in out.values()) == 6


def test_rfm_scores_monotone(spark, sf_dir):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A
    from azuredataengineering_deeplearning_spark.sources.readers import load_tables

    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    out = A.rfm_segments(o, "o_custkey", "o_orderdate", "o_totalprice").collect()
    rows = sorted(out, key=lambda r: r.monetary)
    # m_score is non-decreasing with monetary; scores within 1..4
    scores = [r.m_score for r in rows]
    assert scores == sorted(scores)
    assert all(1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 for r in out)


def test_onehot_cardinality_guard(spark):
    import pytest

    from azuredataengineering_deeplearning_spark.operators.encoders import onehot_encode

    df = spark.range(0, 500).select(
        F.concat(F.lit("cat_"), F.col("id")).alias("c"), F.col("id").alias("v")
    )
    # inference over the cap raises with a clear message instead of
    # collecting an unbounded distinct set to the driver
    with pytest.raises(ValueError, match="distinct values"):
        onehot_encode(df, "c", max_categories=100)
    # explicit categories bypass the inference entirely
    out = onehot_encode(df, "c", categories=["cat_1", "cat_2"])
    assert out.filter(F.col("c_cat_1") == 1).count() == 1
    # bounded inference still works
    small = spark.range(0, 50).select((F.col("id") % 3).cast("string").alias("c"))
    enc = onehot_encode(small, "c", max_categories=100)
    assert {"c_0", "c_1", "c_2"} <= set(enc.columns)


def test_ab_welch_matches_numpy(spark):
    import numpy as np
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    a = [10.0, 12.0, 11.0, 13.0, 9.0]
    b = [20.0, 22.0, 19.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "arm string, x double")
    (r,) = A.ab_welch(df, "arm", "x", "a", "b").collect()
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    qa, qb = va / len(a), vb / len(b)
    t = (np.mean(a) - np.mean(b)) / np.sqrt(qa + qb)
    dof = (qa + qb) ** 2 / (qa**2 / (len(a) - 1) + qb**2 / (len(b) - 1))
    assert r.n_a == 5 and r.n_b == 3
    assert abs(r.mean_a - np.mean(a)) < 1e-9
    assert abs(r.t_stat - t) < 1e-9
    assert abs(r.dof - dof) < 1e-9


def test_concentration_gini_hhi_extremes(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    rows = [("eq", f"u{i}", 10.0) for i in range(10)]          # perfect equality
    rows += [("mono", "only", 100.0)]                           # single unit
    rows += [("skew", "big", 99.0)] + [("skew", f"s{i}", 0.5) for i in range(2)]
    df = spark.createDataFrame(rows, "g string, unit string, v double")
    out = {r.g: r for r in A.concentration(df, ["g"], "unit", "v").collect()}
    assert abs(out["eq"].gini) < 1e-9 and abs(out["eq"].hhi - 0.1) < 1e-9
    assert out["mono"].gini == 0.0 and out["mono"].hhi == 1.0
    assert out["mono"].top_share == 1.0
    assert out["skew"].gini > 0.6 and out["skew"].top_share > 0.9


def test_abc_classification_tiers(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    # one dominant unit (A), one mid (B), several tail (C)
    rows = [("g", "big", 80.0), ("g", "mid", 15.0)] + [
        ("g", f"t{i}", 1.0) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, unit string, v double")
    out = {r.unit: r.abc_class for r in
           A.abc_classification(df, ["g"], "unit", "v").collect()}
    assert out["big"] == "A"
    assert out["mid"] == "B"
    assert all(out[f"t{i}"] == "C" for i in range(5))


def test_association_rules_lift_semantics(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    # beer+diapers co-occur in 4/6 baskets; milk is everywhere (lift ~1)
    baskets = [
        (1, "beer"), (1, "diapers"), (1, "milk"),
        (2, "beer"), (2, "diapers"), (2, "milk"),
        (3, "beer"), (3, "diapers"), (3, "milk"),
        (4, "beer"), (4, "diapers"), (4, "milk"),
        (5, "milk"), (5, "bread"),
        (6, "milk"), (6, "bread"),
    ]
    df = spark.createDataFrame(baskets, "bk int, it string")
    out = {(r.item_a, r.item_b): r for r in
           A.association_rules(df, "bk", "it", min_pair_support=2, top_k=50).collect()}
    bd = out[("beer", "diapers")]
    assert bd.n_ab == 4 and abs(bd.confidence - 1.0) < 1e-12
    assert abs(bd.lift - 6 / 4) < 1e-12  # P(d|b)=1 vs P(d)=4/6
    bm = out[("beer", "milk")]
    assert abs(bm.lift - 1.0) < 1e-12  # milk is independent of beer


def test_lift_table_concentrates_positives(spark):
    from pyspark.sql import functions as Fx
    from azuredataengineering_deeplearning_spark.operators.encoders import lift_table

    # score correlates with label: top scores mostly positive
    rows = [(float(i), i >= 80) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {r.bucket: r for r in lift_table(df, "score", "y", n_buckets=10).collect()}
    assert out[1].positives == 10 and abs(out[1].lift - 5.0) < 1e-9  # 100%/20%
    assert abs(out[2].lift - 5.0) < 1e-9
    assert out[3].positives == 0
    assert abs(out[2].cum_capture - 1.0) < 1e-9  # all positives in top 2 deciles


def test_group_mode_deterministic_tiebreak(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    rows = [("g", 5), ("g", 5), ("g", 3), ("g", 3), ("g", 9)]
    df = spark.createDataFrame(rows, "g string, v int")
    (r,) = A.group_mode(df, ["g"], "v").collect()
    assert (r.mode, r.mode_count) == (3, 2)  # tie 5 vs 3 -> smallest wins


def test_mad_outliers_robust_to_the_outlier(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = {r.v: r.is_outlier for r in A.mad_outliers(df, ["g"], "v").collect()}
    assert out[1000.0] is True
    assert all(not out[v] for v in vals if v != 1000.0)


def test_winsorize_clamps_to_group_band(spark):
    from azuredataengineering_deeplearning_spark.operators.relational import winsorize

    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    out = {r.v: r.v_wins for r in winsorize(df, ["g"], "v", 0.10, 0.90).collect()}
    assert out[1.0] > 1.0 and out[100.0] < 100.0  # tails clamped
    assert out[50.0] == 50.0  # middle untouched
    assert min(out.values()) == out[1.0] and max(out.values()) == out[100.0]


def test_cramers_v_extremes(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    # perfectly dependent columns -> V = 1
    dep = spark.createDataFrame(
        [(x, x) for x in ["p", "q", "r"] * 20], "a string, b string"
    )
    (r,) = A.cramers_v(dep, "a", "b").collect()
    assert abs(r.cramers_v - 1.0) < 1e-9
    # independent uniform columns -> V ~ 0
    ind = spark.createDataFrame(
        [(x, y) for x in ["p", "q"] for y in ["u", "w"] for _ in range(25)],
        "a string, b string",
    )
    (r2,) = A.cramers_v(ind, "a", "b").collect()
    assert abs(r2.cramers_v) < 1e-9


def test_eta_squared_extremes(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    # value fully determined by group -> 1; identical group means -> 0
    det = spark.createDataFrame(
        [("a", 1.0)] * 10 + [("b", 5.0)] * 10, "g string, v double"
    )
    (r,) = A.eta_squared(det, "g", "v").collect()
    assert abs(r.eta_squared - 1.0) < 1e-9
    flat = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0)], "g string, v double"
    )
    (r2,) = A.eta_squared(flat, "g", "v").collect()
    assert abs(r2.eta_squared) < 1e-9


def test_mutual_information_extremes(spark):
    import math
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    dep = spark.createDataFrame(
        [(x, x) for x in ["p", "q"] * 30], "a string, b string"
    )
    (r,) = A.mutual_information(dep, "a", "b").collect()
    assert abs(r.mi - math.log(2)) < 1e-9       # identical binary cols: MI = H = ln2
    assert abs(r.mi_normalized - 1.0) < 1e-9
    ind = spark.createDataFrame(
        [(x, y) for x in ["p", "q"] for y in ["u", "w"] for _ in range(25)],
        "a string, b string",
    )
    (r2,) = A.mutual_information(ind, "a", "b").collect()
    assert abs(r2.mi) < 1e-9


def test_quantile_transform_uniformizes(spark):
    from azuredataengineering_deeplearning_spark.operators.encoders import (
        quantile_transform,
    )

    # heavy-tailed values -> uniform ranks; ties share a rank
    vals = [1.0, 2.0, 4.0, 8.0, 8.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    out = sorted(
        quantile_transform(df, ["g"], "v").collect(), key=lambda r: (r.v, r.v_q)
    )
    assert out[0].v_q == 0.0 and out[-1].v_q == 1.0
    eights = [r.v_q for r in out if r.v == 8.0]
    assert eights[0] == eights[1]  # SQL percent_rank tie semantics


def test_ks_two_sample_extremes(spark):
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    a = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    same = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    (r,) = A.ks_two_sample(a, same, "v").collect()
    assert abs(r.ks_d) < 1e-12  # identical samples
    disjoint = spark.createDataFrame([(float(i + 1000),) for i in range(100)], "v double")
    (r2,) = A.ks_two_sample(a, disjoint, "v").collect()
    assert abs(r2.ks_d - 1.0) < 1e-12  # fully separated distributions


def test_powerlaw_alpha_recovers_exponent(spark):
    import numpy as np
    from azuredataengineering_deeplearning_spark.operators import aggregates as A

    # sample a Pareto(alpha=2.5) tail via inverse CDF on a fixed grid
    rng = np.linspace(0.001, 0.999, 5000)
    xs = 1.0 * (1 - rng) ** (-1 / 1.5)  # alpha = 2.5 => exponent param 1.5
    df = spark.createDataFrame([(float(v),) for v in xs], "v double")
    (r,) = A.powerlaw_alpha(df, "v", 1.0).collect()
    assert abs(r.alpha - 2.5) < 0.05
    assert r.alpha_se < 0.05 and r.n_tail == 5000
