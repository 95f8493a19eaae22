"""RandomForest chain (spark_randomforest.py parity): class weights,
assembly, distributed fit, map-side scoring."""

import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.operators import ml as ML


def _toy(spark, n=600):
    # two separable gaussian blobs + a rare third class
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 3).alias("cls"),
    )
    return base.select(
        "id",
        F.when(F.col("cls") == 0, "alpha")
        .when(F.col("cls") == 1, "beta")
        .otherwise("gamma")
        .alias("label"),
        (F.randn(1) + F.col("cls") * 6.0).alias("x1"),
        (F.randn(2) - F.col("cls") * 6.0).alias("x2"),
    ).filter((F.col("label") != "gamma") | (F.col("id") % 10 == 2))


def test_class_weight_column_is_balanced_formula(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 2, "label string"
    )
    w = {r.label: r.weight for r in
         ML.class_weight_column(df, "label").select("label", "weight").distinct().collect()}
    # total=10, k=2: a -> 10/(2*8)=0.625, b -> 10/(2*2)=2.5
    assert w == {"a": pytest.approx(0.625), "b": pytest.approx(2.5)}


def test_rf_fit_predict_roundtrip(spark):
    train = _toy(spark).cache()
    model, si = ML.fit_random_forest(
        train, ["x1", "x2"], "label", num_trees=20, max_depth=5
    )
    scored = ML.predict(model, si, train, ["x1", "x2"])
    acc = (
        scored.select(
            (F.col("predicted_label") == F.col("label")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc > 0.95, acc
    # scoring is map-side: no exchange in the prediction plan beyond the scan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rf_unweighted_fit(spark):
    # weighted=False must omit weightCol entirely — passing None to the
    # JVM param made fit() throw NullPointerException
    train = _toy(spark).cache()
    model, si = ML.fit_random_forest(
        train, ["x1", "x2"], "label", weighted=False, num_trees=5, max_depth=3
    )
    scored = ML.predict(model, si, train, ["x1", "x2"])
    assert scored.count() == train.count()


def test_feature_importances_rank_signal_over_noise(spark):
    train = _toy(spark).withColumn("noise", F.randn(9)).cache()
    model, _ = ML.fit_random_forest(
        train, ["x1", "x2", "noise"], "label", num_trees=20, max_depth=5
    )
    imps = ML.feature_importances(model, ["x1", "x2", "noise"])
    assert imps[0][0] in ("x1", "x2")
    assert dict(imps)["noise"] < 0.1
    assert abs(sum(v for _, v in imps) - 1.0) < 1e-6


# ------------------------------------------------------------- evaluation


def test_confusion_matrix_counts(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a")],
        "label string, pred string",
    )
    cm = {(r["label"], r["prediction"]): r["n"]
          for r in ML.confusion_matrix(df, "label", "pred").collect()}
    assert cm == {("a", "a"): 2, ("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_classification_report_hand_values(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a")],
        "label string, pred string",
    )
    rep = {r["cls"]: r for r in
           ML.classification_report(df, "label", "pred").collect()}
    a, b = rep["a"], rep["b"]
    assert a["support"] == 3 and b["support"] == 2
    assert a["precision"] == pytest.approx(2 / 3)
    assert a["recall"] == pytest.approx(2 / 3)
    assert a["f1"] == pytest.approx(2 / 3)
    assert b["precision"] == pytest.approx(0.5)
    assert b["f1"] == pytest.approx(0.5)


def test_classification_report_unpredicted_class(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("p", "a")], "label string, pred string"
    )
    rep = {r["cls"]: r for r in
           ML.classification_report(df, "label", "pred").collect()}
    assert rep["p"]["precision"] == 0.0 and rep["p"]["recall"] == 0.0
    assert rep["p"]["support"] == 1


def test_binary_auc_known_cases(spark):
    perfect = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "y int, s double"
    )
    r = ML.binary_auc(perfect, "y", "s").first()
    assert r["auc"] == pytest.approx(1.0) and r["n_pos"] == 2 and r["n_neg"] == 2
    mixed = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.1)], "y int, s double"
    )
    assert ML.binary_auc(mixed, "y", "s").first()["auc"] == pytest.approx(0.75)
    # all scores tied -> 0.5 by the tie correction
    tied = spark.createDataFrame(
        [(1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)], "y int, s double"
    )
    assert ML.binary_auc(tied, "y", "s").first()["auc"] == pytest.approx(0.5)


def test_regression_metrics_hand_values(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 4.0)], "y double, yhat double"
    )
    r = ML.regression_metrics(df, "y", "yhat").first()
    assert r["n"] == 3
    assert r["mae"] == pytest.approx(1 / 3)
    assert r["rmse"] == pytest.approx((1 / 3) ** 0.5)
    assert r["r2"] == pytest.approx(1 - 1 / 2)  # sse=1, sst=2


def test_calibration_bins(spark):
    df = spark.createDataFrame(
        [(0.05, 0), (0.08, 0), (0.95, 1), (0.92, 1), (1.0, 1)],
        "s double, y int",
    )
    bins = {r["bin"]: r for r in
            ML.calibration_bins(df, "y", "s", bins=10).collect()}
    assert set(bins) == {0, 9}
    assert bins[0]["n"] == 2 and bins[0]["pos_rate"] == 0.0
    assert bins[9]["n"] == 3 and bins[9]["pos_rate"] == 1.0  # s=1.0 clamps to bin 9
    assert bins[0]["mean_score"] == pytest.approx(0.065)


def test_threshold_sweep_pr_curve(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.1)], "y int, s double"
    )
    rows = {r["threshold"]: r for r in
            ML.threshold_sweep(df, "y", "s").collect()}
    assert rows[0.9]["precision"] == 1.0 and rows[0.9]["recall"] == 0.5
    assert rows[0.7]["precision"] == pytest.approx(2 / 3)
    assert rows[0.7]["recall"] == 1.0
    assert rows[0.1]["recall"] == 1.0 and rows[0.1]["precision"] == 0.5
    best = max(rows.values(), key=lambda r: r["f1"])
    assert best["threshold"] == 0.7  # f1 = 0.8 beats 2/3 and 2/3


def test_gbt_chain_end_to_end(spark):
    import pyspark.sql.functions as SF

    df = spark.range(400).select(
        (SF.col("id") % 2).cast("string").alias("lbl"),
        (SF.col("id") % 2 + SF.rand(7) * 0.2).alias("x1"),
        SF.rand(11).alias("x2"),
    )
    model, si = ML.fit_gradient_boosting(
        df, ["x1", "x2"], "lbl", num_iterations=5, max_depth=2
    )
    scored = ML.predict(model, si, df, ["x1", "x2"])
    acc = scored.filter(SF.col("predicted_label") == SF.col("lbl")).count() / 400
    assert acc > 0.95  # x1 separates the classes almost perfectly
    imps = ML.feature_importances(model, ["x1", "x2"])
    assert imps[0][0] == "x1" and imps[0][1] > 0.5


def test_kendall_tau_b_exact(spark):
    # group g: y = x (perfect concordance); group h: y = -x
    rows = [("g", float(i), float(i)) for i in range(10)]
    rows += [("h", float(i), float(-i)) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    taus = {r["grp"]: r for r in
            ML.kendall_tau_b(df, ["grp"], "x", "y").collect()}
    assert taus["g"]["tau_b"] == pytest.approx(1.0)
    assert taus["g"]["concordant"] == 45 and taus["g"]["discordant"] == 0
    assert taus["h"]["tau_b"] == pytest.approx(-1.0)


def test_kendall_tau_b_ties(spark):
    # constant y -> denominator 0 -> tau 0 by convention
    df = spark.createDataFrame(
        [("g", 1.0, 5.0), ("g", 2.0, 5.0), ("g", 3.0, 5.0)],
        "grp string, x double, y double",
    )
    r = ML.kendall_tau_b(df, ["grp"], "x", "y").first()
    assert r["tau_b"] == 0.0 and r["concordant"] == 0


def test_build_ranking_slates(spark):
    rows = [(1, i, float(i * 10)) for i in range(5)]
    rows += [(2, i, float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "uid long, t long, v double")
    s = {r["uid"]: r for r in
         ML.build_ranking_slates(df, "uid", "t", "v", max_len=20).collect()}
    assert s[1]["seq"] == [0.0, 10.0, 20.0, 30.0, 40.0]
    assert s[1]["seq_len"] == 5 and s[1]["last"] == 40.0
    # long series truncates to the LAST 20 steps
    assert s[2]["seq"] == [float(i) for i in range(10, 30)]
    assert s[2]["seq_len"] == 30 and s[2]["last"] == 29.0


def test_negative_sample_interactions(spark):
    pos = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 101), (2, 10, 102)],
        "u long, it long, rid long",
    )
    n_items = spark.createDataFrame([(50,)], "P long")
    out = ML.negative_sample_interactions(
        pos, "u", "it", ["rid"], n_items, k=3
    ).collect()
    positives = [r for r in out if r["label"] == 1]
    negatives = [r for r in out if r["label"] == 0]
    assert len(positives) == 3
    assert 0 < len(negatives) <= 9
    observed = {(1, 10), (1, 11), (2, 10)}
    for r in negatives:
        assert (r["user_key"], r["item_key"]) not in observed
        assert 1 <= r["item_key"] <= 50
    # deterministic across runs
    again = ML.negative_sample_interactions(
        pos, "u", "it", ["rid"], n_items, k=3
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_classification_summary(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "a")],
        "label string, pred string",
    )
    r = ML.classification_summary(df, "label", "pred").first()
    assert r["n"] == 5
    assert r["accuracy"] == pytest.approx(3 / 5)
    assert r["macro_f1"] == pytest.approx((2 / 3 + 0.5) / 2)
    assert r["weighted_f1"] == pytest.approx((2 / 3 * 3 + 0.5 * 2) / 5)


def test_ndcg_at_k(spark):
    # perfect ranking vs inverted ranking
    rows = [("p", float(10 - i), float(10 - i), i) for i in range(5)]
    rows += [("inv", float(i), float(10 - i), i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, score double, rel double, tie int")
    r = {x["g"]: x for x in
         ML.ndcg_at_k(df, ["g"], "score", "rel", "tie", k=5).collect()}
    assert r["p"]["ndcg"] == pytest.approx(1.0)
    assert 0 < r["inv"]["ndcg"] < 1.0
    assert r["p"]["dcg"] == pytest.approx(r["p"]["idcg"])


def test_pca_anomaly_scores(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    # rank-2 structure embedded in 4-D + 5 off-manifold outliers
    z = rng.normal(size=(200, 2))
    w = np.array([[1.0, 0.5, -0.3, 0.2], [0.1, -1.0, 0.4, 0.8]])
    inliers = z @ w
    outliers = rng.normal(size=(5, 4)) * 3 + np.array([0, 0, 5.0, -5.0])
    rows = [(0, *map(float, r)) for r in inliers]
    rows += [(1, *map(float, r)) for r in outliers]
    df = spark.createDataFrame(rows, "is_out int, a double, b double, c double, d double")
    feats = ["a", "b", "c", "d"]
    # fit on the (mostly clean) training frame; five far outliers would
    # otherwise dominate the variance and tilt the components
    clean = df.filter(df.is_out == 0)
    mean, comps = ML.fit_pca(clean, feats, k=2)
    scored = ML.pca_anomaly_scores(df, feats, mean, comps).collect()
    in_err = [r["recon_err"] for r in scored if r["is_out"] == 0]
    out_err = [r["recon_err"] for r in scored if r["is_out"] == 1]
    assert max(in_err) < min(out_err)  # clean separation on planted data
    assert max(in_err) < 0.5
    # deterministic fit: same sample order -> identical components
    mean2, comps2 = ML.fit_pca(clean, feats, k=2)
    assert np.allclose(mean, mean2) and np.allclose(comps, comps2)


def test_train_score_evaluate_chain(spark):
    """The full reference loop: fit -> map-side score -> probability ->
    AUC + report, all engine operators composing."""
    import pyspark.sql.functions as SF
    from pyspark.ml.functions import vector_to_array

    df = spark.range(600).select(
        (SF.col("id") % 2).cast("string").alias("lbl"),
        ((SF.col("id") % 2) + SF.rand(3) * 0.6).alias("x1"),
        SF.rand(5).alias("x2"),
    )
    model, si = ML.fit_random_forest(df, ["x1", "x2"], "lbl", num_trees=10, max_depth=3)
    scored = ML.predict(model, si, df, ["x1", "x2"])
    # probability of the indexed class '1'
    idx_of_1 = si.labelsArray[0].index("1")
    probs = scored.select(
        SF.col("lbl").cast("int").alias("y"),
        vector_to_array("probability")[idx_of_1].alias("s"),
        "predicted_label",
    )
    auc = ML.binary_auc(probs, "y", "s").first()["auc"]
    assert auc > 0.9  # x1 separates well
    rep = {r["cls"]: r for r in
           ML.classification_report(scored, "lbl", "predicted_label").collect()}
    assert rep["1"]["f1"] > 0.8 and rep["0"]["f1"] > 0.8


def test_binary_auc_single_class_null_not_error(spark):
    # ANSI mode (Spark 4 default) would error on the 0-denominator
    allpos = spark.createDataFrame([(1, 0.9), (1, 0.1)], "y int, s double")
    r = ML.binary_auc(allpos, "y", "s").first()
    assert r["auc"] is None and r["n_neg"] == 0
    allneg = spark.createDataFrame([(0, 0.9)], "y int, s double")
    assert ML.binary_auc(allneg, "y", "s").first()["auc"] is None
    sweep = ML.threshold_sweep(allneg, "y", "s").first()
    assert sweep["recall"] == 0.0 and sweep["precision"] == 0.0


def test_ordered_running_sums_no_raw_fallback(spark):
    """The raw=None path (bounds + totals computed from the counts
    frame itself) must agree with the raw-hinted path and with a
    pandas cumsum, ascending and descending."""
    import pandas as pd

    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark.operators.ml import (
        _ordered_running_sums,
    )

    pdf = pd.DataFrame({"s": [float(x) for x in range(40)], "v": [float((x * 3) % 7) for x in range(40)]})
    df = spark.createDataFrame(pdf).repartition(6)
    for asc in (True, False):
        cum, tot = _ordered_running_sums(df, "s", ["v"], ascending=asc)
        got = {r["s"]: r["__cum_v"] for r in cum.collect()}
        order = pdf.sort_values("s", ascending=asc)
        ref = dict(zip(order["s"], order["v"].cumsum()))
        assert got == ref, asc
        assert tot["v"] == pdf["v"].sum()


def test_quantile_transform_global_paths_match_window(spark):
    """Empty-keys quantile_transform (distributed rank path, with and
    without tiebreak) must equal the single-window percent_rank."""
    from pyspark.sql import Window

    from azuredataengineering_deeplearning_spark.operators.encoders import (
        quantile_transform,
    )

    df = spark.createDataFrame(
        [(i, float((i * 13) % 7)) for i in range(50)], "tid int, v double"
    ).repartition(5)
    # ties, no tiebreak: SQL percent_rank tie semantics
    got = {r.tid: r.v_q for r in quantile_transform(df, [], "v").collect()}
    ref = {
        r.tid: r.v_q
        for r in df.withColumn(
            "v_q", F.percent_rank().over(Window.orderBy(F.col("v")))
        ).collect()
    }
    assert got == ref
    # strict ordering via tiebreak
    got2 = {r.tid: r.v_q for r in quantile_transform(df, [], "v", tiebreak="tid").collect()}
    ref2 = {
        r.tid: r.v_q
        for r in df.withColumn(
            "v_q", F.percent_rank().over(Window.orderBy(F.col("v"), F.col("tid")))
        ).collect()
    }
    assert got2 == ref2
