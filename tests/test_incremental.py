"""Incremental maintenance: state merges ≡ full recompute, CDC diff
statuses (incl. the NULL-shift trap), skew profiler invariants."""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators import incremental as I
from azuredataengineering_deeplearning_spark.operators.profile import key_skew_profile

SPEC = {
    "n": ("count", None),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_full_recompute_any_split(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 0.125).alias("v")
    )
    full = I.finalize_state(I.aggregate_batch(df, ["k"], SPEC), SPEC)

    for mod in (2, 3, 5):
        batches = [df.filter(F.col("id") % mod == i) for i in range(mod)]
        state = I.aggregate_batch(batches[0], ["k"], SPEC)
        for b in batches[1:]:
            state = I.incremental_update(state, b, ["k"], SPEC)
        assert _rows(I.finalize_state(state, SPEC)) == _rows(full)


def test_finalize_types(spark):
    df = spark.range(0, 10).select(F.lit("a").alias("k"), F.col("id").cast("double").alias("v"))
    out = I.finalize_state(I.aggregate_batch(df, ["k"], SPEC), SPEC)
    dtypes = dict(out.dtypes)
    assert dtypes["n"] == "bigint"
    assert dtypes["s"] == "double"


def test_unsupported_kind_raises(spark):
    df = spark.range(1).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        I.aggregate_batch(df, ["k"], {"x": ("median", "v")})


def test_table_diff_statuses(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k int, s string, v double"
    )
    right = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)], "k int, s string, v double"
    )
    got = {r["k"]: r["diff_status"] for r in I.table_diff(left, right, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}

    full = I.table_diff(left, right, ["k"], include_unchanged=True)
    assert {r["k"]: r["diff_status"] for r in full.collect()}[2] == "unchanged"


def test_table_diff_null_shift_is_a_change(spark):
    # (x, NULL) -> (NULL, x): naive multi-arg hashing that skips NULLs
    # would call this unchanged; the json fingerprint must not
    left = spark.createDataFrame([(1, "x", None)], "k int, a string, b string")
    right = spark.createDataFrame([(1, None, "x")], "k int, a string, b string")
    out = I.table_diff(left, right, ["k"]).collect()
    assert [(r["k"], r["diff_status"]) for r in out] == [(1, "changed")]


def test_key_skew_profile(spark):
    # key 0 holds 910 of 1000 rows -> dominant share, big skew ratio
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 910, 0).otherwise(1 + F.col("id") % 9).alias("k")
    )
    prof = key_skew_profile(df, ["k"], top_n=3).collect()
    assert [r["rank"] for r in prof] == [1, 2, 3]
    top = prof[0]
    assert top["k"] == 0 and top["cnt"] == 910
    assert abs(top["share"] - 0.91) < 1e-9
    # 10 distinct keys, max 910, total 1000 -> ratio 9.1
    assert abs(top["skew_ratio"] - 9.1) < 1e-9


def test_cumulative_distinct_model(spark):
    from azuredataengineering_deeplearning_spark.operators.windows import cumulative_distinct

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"),
        ("u1", 4, "c"), ("u2", 1, "x"), ("u2", 2, "x"),
    ]
    df = spark.createDataFrame(rows, "u string, t int, v string")
    out = cumulative_distinct(df, ["u"], ["t"], "v")
    got = {(r["u"], r["t"]): r["cum_distinct"] for r in out.collect()}
    assert got == {
        ("u1", 1): 1, ("u1", 2): 2, ("u1", 3): 2, ("u1", 4): 3,
        ("u2", 1): 1, ("u2", 2): 1,
    }


def test_series_outliers_flags_spike(spark):
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        series_outliers, series_stats,
    )

    flat = [10.0] * 30
    spiked = flat[:7] + [100.0] + flat[8:]
    df = spark.createDataFrame(
        [("const", flat), ("spike", spiked)], "k string, series array<double>"
    )
    out = series_outliers(series_stats(df, "series"), "series", k=2.5)
    got = {r["k"]: r["outlier_idx"] for r in out.collect()}
    assert got["const"] == []      # stdev 0 -> nothing flagged
    assert got["spike"] == [7]


def test_cms_overestimates_and_merges(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.aggregates import (
        cms_build, cms_estimate, cms_merge,
    )

    # zipf-ish: value v appears (20 - v) times, v in 0..19
    df = spark.range(0, 20).select(
        F.explode(F.sequence(F.lit(1), 20 - F.col("id"))).alias("r"),
        F.col("id").cast("string").alias("v"),
    ).select("v")
    true = {r["v"]: r["cnt"] for r in df.groupBy("v").agg(F.count("*").alias("cnt")).collect()}

    # tight width forces collisions -> estimates never undercount
    sk = cms_build(df, "v", depth=3, width=8)
    est = {
        r["v"]: r["est_cnt"]
        for r in cms_estimate(sk, df.select("v").distinct(), "v", depth=3, width=8).collect()
    }
    n = sum(true.values())
    for v, t in true.items():
        assert est[v] >= t
        assert est[v] <= t + n  # trivial upper bound; real bound is e*N/w

    # merging two half-sketches == sketching the whole
    h1 = df.limit(100)
    h2 = df.exceptAll(h1)
    merged = cms_merge([cms_build(h1, "v", 3, 8), cms_build(h2, "v", 3, 8)])
    whole = cms_build(df, "v", 3, 8)
    m = {(r["row_i"], r["cell"]): r["cnt"] for r in merged.collect()}
    w = {(r["row_i"], r["cell"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.joins import salted_join

    # hot key 0 on the fact side
    facts = spark.range(0, 2000).select(
        F.when(F.col("id") < 1500, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    plain = facts.join(dim, ["k"]).select("k", "payload", "attr")
    salted = salted_join(facts, dim, ["k"], n_salts=4).select("k", "payload", "attr")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left rows with no dim match drop in inner, survive in left join
    lonely = facts.withColumn("k", F.col("k") + 1000)
    lj = salted_join(lonely, dim, ["k"], n_salts=4, how="left")
    assert lj.count() == 2000 and lj.filter("attr IS NULL").count() == 2000
    # right/full outer would duplicate unmatched dim rows per salt: rejected
    import pytest

    for bad in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(facts, dim, ["k"], n_salts=4, how=bad)


def test_file_skipping_report_clustered_vs_random(spark, tmp_path):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.sources.writers import (
        file_skipping_report, write_clustered, write_parquet,
    )

    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), F.rand(7).alias("v")
    )
    clustered = str(tmp_path / "clustered")
    random = str(tmp_path / "random")
    write_clustered(df, clustered, cluster_by=["k"], target_files=10)
    write_parquet(df.orderBy(F.rand(11)), random, target_files=10)

    narrow = file_skipping_report(clustered, "k", 10_000, 12_000)
    assert narrow["n_files"] == 10
    assert narrow["n_skipped"] >= 8          # locality -> most files skip
    assert narrow["rows_skipped"] >= 70_000

    shuffled = file_skipping_report(random, "k", 10_000, 12_000)
    assert shuffled["n_skipped"] == 0        # every file spans the range


def test_profile_table_one_pass(spark):
    from azuredataengineering_deeplearning_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 6.0, None)],
        "i int, d double, s string",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["i"]["n"] == 3 and prof["i"]["n_null"] == 0
    assert prof["i"]["min_num"] == 1.0 and prof["i"]["max_num"] == 3.0
    assert abs(prof["i"]["mean"] - 2.0) < 1e-9
    assert prof["d"]["n_null"] == 1 and abs(prof["d"]["mean"] - 4.0) < 1e-9
    assert prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None


def test_table_checksum_detects_any_change(spark):
    from azuredataengineering_deeplearning_spark.operators.incremental import table_checksum

    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, None)], "k int, v string")
    b = spark.createDataFrame([(3, None), (1, "x"), (2, "y")], "k int, v string")
    c = spark.createDataFrame([(1, "x"), (2, "Y"), (3, None)], "k int, v string")
    ca, cb, cc = (table_checksum(d).collect()[0] for d in (a, b, c))
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])  # order-free
    assert ca["checksum"] != cc["checksum"]                                   # 1 cell differs
    fast = table_checksum(a, portable=False).collect()[0]
    assert fast["n_rows"] == 3 and fast["checksum"] is not None


def test_scd2_as_of_one_version_per_key(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.scd import apply_scd2, scd2_as_of

    rows = [
        ("k1", "2024-01-01", "v1"), ("k1", "2024-03-01", "v2"),
        ("k2", "2024-02-15", "w1"),
    ]
    df = spark.createDataFrame(rows, "k string, d string, v string").withColumn(
        "d", F.to_date("d")
    )
    dim = apply_scd2(df, ["k"], "d")
    got = {r["k"]: r["v"] for r in scd2_as_of(dim, 20240220).collect()}
    assert got == {"k1": "v1", "k2": "w1"}          # v2 not yet effective
    got2 = {r["k"]: r["v"] for r in scd2_as_of(dim, 20240301).collect()}
    assert got2 == {"k1": "v2", "k2": "w1"}
    assert scd2_as_of(dim, 20231231).count() == 0   # before any history


def test_scd2_temporal_join_picks_version_in_force(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.scd import (
        apply_scd2, scd2_temporal_join,
    )

    hist = spark.createDataFrame(
        [("k1", "2024-01-01", "v1"), ("k1", "2024-03-01", "v2")],
        "k string, d string, attr string",
    ).withColumn("d", F.to_date("d"))
    dim = apply_scd2(hist, ["k"], "d").drop("d", "currentVersion")
    facts = spark.createDataFrame(
        [(1, "k1", 20240215), (2, "k1", 20240301), (3, "k2", 20240101)],
        "fid int, k string, dk int",
    )
    out = scd2_temporal_join(facts, dim, ["k"], "dk")
    got = {r["fid"]: r["dim_attr"] for r in out.collect()}
    assert got == {1: "v1", 2: "v2", 3: None}   # unmatched key -> left join null
    # plan stays an equi-join: no nested-loop for the range condition
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_histogram_quantiles_accuracy_and_merge(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.aggregates import (
        histogram, histogram_quantiles,
    )

    df = spark.range(0, 10_000).select(F.col("id").cast("double").alias("v"))
    h = histogram(df, "v", 100, 0.0, 10_000.0)
    est = {r["q"]: r["estimate"] for r in
           histogram_quantiles(h, [0.0, 0.5, 0.9], 100, 0.0, 10_000.0).collect()}
    assert est[0.0] == 0.0
    assert abs(est[0.5] - 5000.0) <= 100.0    # within one bucket width
    assert abs(est[0.9] - 9000.0) <= 100.0

    # shard histograms merged by bin-sum == whole histogram
    h1 = histogram(df.filter("v < 4000"), "v", 100, 0.0, 10_000.0)
    h2 = histogram(df.filter("v >= 4000"), "v", 100, 0.0, 10_000.0)
    merged = h1.unionByName(h2).groupBy("bin", "bin_lo").agg(
        F.sum("n").alias("n")
    )
    est_m = {r["q"]: r["estimate"] for r in
             histogram_quantiles(merged, [0.5], 100, 0.0, 10_000.0).collect()}
    assert est_m[0.5] == est[0.5]


def test_compact_scd2_adjacent_only(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.scd import (
        apply_scd2, compact_scd2,
    )

    # attr sequence A, A, B, A: the two leading As merge; the last A is
    # non-adjacent and must stay its own version
    rows = [
        ("k", "2024-01-01", "A"), ("k", "2024-02-01", "A"),
        ("k", "2024-03-01", "B"), ("k", "2024-04-01", "A"),
    ]
    df = spark.createDataFrame(rows, "k string, d string, attr string").withColumn(
        "d", F.to_date("d")
    )
    dim = apply_scd2(df, ["k"], "d").drop("d")
    out = sorted(
        (r["effectiveDate"], r["expirationDate"], r["attr"], r["currentVersion"])
        for r in compact_scd2(dim, ["k"], ["attr"]).collect()
    )
    assert out == [
        (20240101, 20240229, "A", 0),
        (20240301, 20240331, "B", 0),
        (20240401, 20991231, "A", 1),
    ]
