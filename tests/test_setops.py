import pyspark.sql.functions as F

from azuredataengineering_deeplearning_spark.operators import setops as U
from azuredataengineering_deeplearning_spark.sources.readers import load_tables


def test_sample_fraction_bounds(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    n, total = U.sample_fraction(o, 0.25, seed=42).count(), o.count()
    assert 0.15 * total < n < 0.35 * total


def test_sample_deterministic_with_seed(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    a = {r.o_orderkey for r in U.sample_fraction(o, 0.2, seed=7).select("o_orderkey").collect()}
    b = {r.o_orderkey for r in U.sample_fraction(o, 0.2, seed=7).select("o_orderkey").collect()}
    assert a == b


def test_rand_fold_range(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    folds = U.rand_fold(o, 10, seed=42).agg(
        F.min("fold").alias("lo"), F.max("fold").alias("hi")
    ).collect()[0]
    assert folds.lo >= 0 and folds.hi <= 10


def test_group_split_disjoint_and_complete(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = U.group_split(ev, "user_id", [0.8, 0.1, 0.1], seed=42)
    U.validate_disjoint_splits(out, "user_id")
    assert out.filter(F.col("split").isNull()).count() == 0
    assert out.count() == ev.count()


def test_mixture_sample_proportions(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    srcs = {
        "open": o.filter(F.col("o_orderstatus") == "O"),
        "done": o.filter(F.col("o_orderstatus") == "F"),
    }
    out = U.mixture_sample(srcs, {"open": 0.7, "done": 0.3}, 300, seed=42)
    by = {r.o_orderstatus: r.n for r in out.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert 0.5 < by.get("O", 0) / 210 < 1.5
    assert 0.5 < by.get("F", 0) / 90 < 1.5


def test_reverse_groups_is_inverse(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c")], "k int, t int, v string"
    )
    out = U.reverse_groups(df, ["k"], "t", "v").orderBy("pos").collect()
    assert [r.value for r in out] == ["c", "b", "a"]


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from azuredataengineering_deeplearning_spark.operators import setops as U2
    from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    fr = {"en": 0.2, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    s1 = U2.stratified_sample(d, "lang", fr, seed=7)
    got = {r["lang"]: r["count"] for r in s1.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    # full-rate strata keep every row; sampled stratum lands in loose
    # binomial bounds; determinism: same seed → same rows
    for lang in ("de", "es", "fr", "zh"):
        assert got[lang] == base[lang]
    assert 0.05 * base["en"] <= got.get("en", 0) <= 0.45 * base["en"]
    s2 = U2.stratified_sample(d, "lang", fr, seed=7)
    assert s1.select("doc_id").exceptAll(s2.select("doc_id")).count() == 0


def test_hash_sample_deterministic_and_map_only(spark, sf_dir):
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    s1 = U.hash_sample(o, "o_orderkey", 0.25)
    n, total = s1.count(), o.count()
    assert 0.15 * total < n < 0.35 * total
    # deterministic: re-evaluation yields the identical row set
    assert s1.select("o_orderkey").exceptAll(
        U.hash_sample(o, "o_orderkey", 0.25).select("o_orderkey")
    ).count() == 0
    # nested fractions: a 10% hash sample is a subset of the 25% one
    s_small = U.hash_sample(o, "o_orderkey", 0.10).select("o_orderkey")
    assert s_small.exceptAll(s1.select("o_orderkey")).count() == 0
    # map-only plan: no exchange anywhere
    assert "Exchange" not in s1._jdf.queryExecution().executedPlan().toString()


def test_hash_fold_range_and_group_safety(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = U.hash_fold(ev, "user_id", 7)
    mm = out.agg(F.min("fold"), F.max("fold")).first()
    assert mm[0] >= 0 and mm[1] <= 6
    # group-safe: each user_id maps to exactly one fold
    leaked = out.groupBy("user_id").agg(F.countDistinct("fold").alias("n")).filter("n > 1").count()
    assert leaked == 0


def test_hash_group_split_disjoint_and_sized(spark, sf_dir):
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = U.hash_group_split(ev, "user_id", [0.8, 0.1, 0.1])
    U.validate_disjoint_splits(out, "user_id")
    by_user = out.select("user_id", "split").distinct()
    n_users = by_user.count()
    frac0 = by_user.filter("split = 0").count() / n_users
    # binomial bounds: p=0.8 within 4 sigma (sf0.001 has only ~15 users)
    sigma = (0.8 * 0.2 / n_users) ** 0.5
    assert abs(frac0 - 0.8) < 4 * sigma + 1 / n_users
    assert out.count() == ev.count()


def test_hash_weighted_sample_rates(spark):
    # weight 0 keeps nothing; weight 1 keeps everything; 0.5 ~ half
    df = spark.createDataFrame([(i,) for i in range(4000)], "k int")
    zero = U.hash_weighted_sample(df, "k", F.lit(0.0)).count()
    full = U.hash_weighted_sample(df, "k", F.lit(1.0)).count()
    half = U.hash_weighted_sample(df, "k", F.lit(0.5)).count()
    assert zero == 0 and full == 4000
    assert 1700 < half < 2300
    # deterministic
    a = {r.k for r in U.hash_weighted_sample(df, "k", F.lit(0.3)).collect()}
    b = {r.k for r in U.hash_weighted_sample(df, "k", F.lit(0.3)).collect()}
    assert a == b


def test_select_until_budget_greedy_prefix(spark):
    from azuredataengineering_deeplearning_spark.operators import text as T

    rows = [("en", 1, 9.0, 40), ("en", 2, 8.0, 40), ("en", 3, 7.0, 40),
            ("de", 4, 5.0, 100)]
    df = spark.createDataFrame(rows, "lang string, doc_id int, q double, n int")
    out = {r.doc_id for r in
           T.select_until_budget(df, ["lang"], "q", F.col("n"), 80,
                                 tiebreak=["doc_id"]).collect()}
    # en: doc1 (before=0) + doc2 (before=40) taken; doc3 (before=80) not;
    # de: doc4 taken (before=0 even though 100 > budget - greedy prefix)
    assert out == {1, 2, 4}


def test_stratified_fixed_sample_exact_counts_and_determinism(spark):
    from azuredataengineering_deeplearning_spark.operators import setops as U

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(100)] + [(1000, "c")]
    df = spark.createDataFrame(rows, "k long, s string")
    out = U.stratified_fixed_sample(df, "s", "k", 10)
    counts = {r.s: r.n for r in out.groupBy("s").agg(__import__(
        "pyspark.sql.functions", fromlist=["count"]
    ).count("*").alias("n")).collect()}
    assert counts == {"a": 10, "b": 10, "c": 1}  # small stratum: all rows
    # determinism: same draw every run
    again = {(r.k, r.s) for r in U.stratified_fixed_sample(df, "s", "k", 10).collect()}
    assert {(r.k, r.s) for r in out.collect()} == again
