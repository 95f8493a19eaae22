"""Edge semantics across operator families: nulls, empties, singleton
groups — the inputs a 100-TB corpus *will* contain somewhere."""

import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.operators import aggregates as A
from azuredataengineering_deeplearning_spark.operators import dedup as DD
from azuredataengineering_deeplearning_spark.operators import merge as M
from azuredataengineering_deeplearning_spark.operators import profile as P
from azuredataengineering_deeplearning_spark.operators import similarity as SIM
from azuredataengineering_deeplearning_spark.operators import windows as W


def test_cumsum_null_values_pass_through(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 5.0)],
        "k string, t int, v double",
    )
    rows = {r.t: r.c for r in W.cumsum(df, ["k"], "t", "v", out="c").collect()}
    # SQL SUM ignores NULL: running sum holds at the null row
    assert rows[1] == 10.0 and rows[2] == 10.0 and rows[3] == 15.0


def test_cumsum_null_key_forms_its_own_group(spark):
    df = spark.createDataFrame(
        [(None, 1, 1.0), (None, 2, 2.0), ("a", 1, 5.0)],
        "k string, t int, v double",
    )
    out = W.cumsum(df, ["k"], "t", "v", out="c")
    null_rows = sorted(
        (r.t, r.c) for r in out.filter(F.col("k").isNull()).collect()
    )
    assert null_rows == [(1, 1.0), (2, 3.0)]  # window partitioning groups NULLs


def test_sessionize_singleton_and_empty(spark):
    one = spark.createDataFrame([("u", 100)], "k string, ts long")
    assert W.sessionize(one, ["k"], "ts", 10).collect()[0].session_id == 1
    empty = one.filter("ts < 0")
    assert W.sessionize(empty, ["k"], "ts", 10).count() == 0


def test_entropy_single_value_group_is_zero(spark):
    df = spark.createDataFrame([("g", "x")] * 4, "g string, v string")
    ent = A.entropy(df, ["g"], "v").collect()[0].entropy
    assert ent == pytest.approx(0.0)


def test_shrink_types_all_null_column_survives(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a long, b long")
    out = P.shrink_types(df)
    # all-NULL column downcast to the smallest type, values stay NULL
    assert dict(out.dtypes)["b"] == "tinyint"
    assert out.filter(F.col("b").isNull()).count() == 2


def test_exact_dedup_null_text_not_grouped_with_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, "")],
        "doc_id long, text string",
    )
    # null and '' are distinct dedup classes
    groups = DD.exact_duplicates(df, "doc_id", "text")
    ids = {r.doc_id for r in groups.collect()}
    # one survivor per class → 2 duplicates flagged total, never mixing classes
    assert ids.issubset({1, 2, 3, 4})
    pairs = groups.collect()
    assert len(pairs) == 2


def test_merge_empty_changeset_is_identity(spark):
    b1 = spark.createDataFrame(
        [("r1", "2024-01-01 00:00:00", "ok")],
        "ResourceId string, PreciseTimeStamp string, Status string",
    ).withColumn("PreciseTimeStamp", F.to_timestamp("PreciseTimeStamp"))
    t = M.initial_load(b1, ["ResourceId"], "PreciseTimeStamp")
    empty = b1.filter("Status = 'nope'")
    t2 = M.apply_changeset(t, empty, ["ResourceId"], "PreciseTimeStamp")
    assert sorted(map(tuple, t2.collect())) == sorted(map(tuple, t.collect()))


def test_cosine_zero_vector_yields_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = SIM.cosine_topk(df, df.filter("vec_id = 1"), k=2).collect()
    # zero-norm query: every cosine NULL; rows still rank (nulls last), no crash
    assert all(r.cos is None for r in out)
    ok = SIM.cosine_topk(df, df.filter("vec_id = 2"), k=2).collect()
    by_n = {r.neighbor_id: r.cos for r in ok}
    assert by_n[3] == pytest.approx(0.0)
    assert by_n[1] is None  # zero-norm corpus vector → NULL cosine, ranked last


def test_new_text_ops_null_and_empty(spark):
    from azuredataengineering_deeplearning_spark.operators import setops as U
    from azuredataengineering_deeplearning_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "plain text")], "doc_id int, text string"
    )
    # PII scrub/counts null-propagate; empty string counts 0
    rows = {r.doc_id: r for r in
            df.select("doc_id", T.pii_scrub("text").alias("c"), *T.pii_counts("text")).collect()}
    assert rows[1].c is None and rows[1].n_email is None
    assert rows[2].c == "" and rows[2].n_email == 0
    # span dedup: null/empty text yields empty clean_text, never crashes
    cl = {r.doc_id: r.clean_text for r in
          T.remove_common_spans(df, "doc_id", "text", k=3, min_docs=2).collect()}
    assert cl[1] == "" and cl[2] == "" and cl[3] == "plain text"
    # hash sampling drops null keys on every engine (NULL comparison)
    assert U.hash_sample(df, "text", 0.5).filter("text IS NULL").count() == 0
    # packing skips null token counts in the running sum (deterministic)
    packed = {r.doc_id: r for r in
              T.pack_sequences(df, "doc_id", T.token_count("text"), 5).collect()}
    assert packed[1].n_tokens is None and packed[1].pack_offset == 0
    assert packed[3].pack_offset == 1


def test_dsir_empty_raw_side(spark):
    import pyspark.sql.functions as F
    from azuredataengineering_deeplearning_spark.operators import text as T

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = T.dsir_scores(df, "doc_id", "text", F.lit(True), buckets=16)
    assert out.count() == 0  # everything is target -> no raw docs to score


def test_unigram_drift_single_group_empty(spark):
    from azuredataengineering_deeplearning_spark.operators import text as T

    df = spark.createDataFrame([(1, "g", "x y")], "id long, g string, text string")
    assert T.unigram_drift(df, "g", "text", buckets=8).count() == 0


def test_funnel_no_first_step_users(spark):
    import datetime as dt
    import pyspark.sql.functions as F
    from azuredataengineering_deeplearning_spark.operators import windows as W

    df = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), "click")], "u string, ts timestamp, e string"
    )
    out = W.funnel_progress(
        df, "u", "ts", [("view", F.col("e") == "view"), ("click", F.col("e") == "click")]
    )
    assert out.count() == 0


def test_ewma_bands_single_point_series(spark):
    import datetime as dt
    from azuredataengineering_deeplearning_spark.operators import timeseries as TS

    df = spark.createDataFrame(
        [("k", dt.date(2024, 1, 1), 5.0)], "uid string, d date, y double"
    )
    (r,) = TS.ewma_bands(df, ["uid"], "d", "y").collect()
    assert r.ewma is None and r.sigma is None and not r.is_anomaly


def test_seasonal_naive_single_observation(spark):
    import datetime as dt
    from azuredataengineering_deeplearning_spark.operators import timeseries as TS

    df = spark.createDataFrame(
        [("k", dt.date(2024, 1, 1), 5.0)], "uid string, d date, y double"
    )
    out = TS.seasonal_naive_forecast(df, ["uid"], "d", "y", horizon=3, season=7)
    rows = sorted(out.collect(), key=lambda r: r["d"])
    assert len(rows) == 3
    # season lag always lands back on the single observed day for h<=7
    assert all(r.yhat == 5.0 for r in rows[:1]) or rows[0].yhat in (5.0, None)


def test_run_checks_empty_frame_min_rows_fails(spark):
    from azuredataengineering_deeplearning_spark.operators import quality as Q

    df = spark.createDataFrame([], "k long, s string")
    out = {r.name: r for r in Q.run_checks(
        df, [Q.Check("enough", "min_rows", threshold=1)]
    ).collect()}
    assert out["enough"].metric == 0.0 and not out["enough"].passed


def test_bigram_xent_empty_when_all_docs_short(spark):
    from azuredataengineering_deeplearning_spark.operators import text as T

    df = spark.createDataFrame([(1, "one"), (2, "two")], "doc_id long, text string")
    assert T.bigram_cross_entropy(df, "doc_id", "text").count() == 0


def test_psi_zero_on_identical_and_positive_on_shift(spark):
    from azuredataengineering_deeplearning_spark.operators import profile as P

    base = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    same = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    (r,) = P.psi(base, same, "v", bins=10).collect()
    assert abs(r.psi) < 1e-9  # identical distribution
    assert r.n_base == 1000 and r.n_new == 1000
    shifted = spark.range(1000).selectExpr("CAST(id % 100 + 60 AS DOUBLE) AS v")
    (r2,) = P.psi(base, shifted, "v", bins=10).collect()
    assert r2.psi > 0.25  # a 60-point shift is a 'major' PSI
