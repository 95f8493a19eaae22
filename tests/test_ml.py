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


def test_feature_importances_rank_signal_over_noise(spark):
    train = _toy(spark).withColumn("noise", F.randn(9)).cache()
    model, _ = ML.fit_random_forest(
        train, ["x1", "x2", "noise"], "label", num_trees=20, max_depth=5
    )
    imps = ML.feature_importances(model, ["x1", "x2", "noise"])
    assert imps[0][0] in ("x1", "x2")
    assert dict(imps)["noise"] < 0.1
    assert abs(sum(v for _, v in imps) - 1.0) < 1e-6
