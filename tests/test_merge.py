"""Golden batch-sequence tests for the changeset-merge engine
(FIXTURES.md B2 shape: initial load, mixed batch, schema drift)."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.operators import merge as M
from azuredataengineering_deeplearning_spark.operators import profile as P
from azuredataengineering_deeplearning_spark.operators.scd import validate_scd2


def _ts(s):
    return dt.datetime.fromisoformat(s)


SCHEMA = "ResourceId string, Name string, Status string, PreciseTimeStamp timestamp"


@pytest.fixture()
def batches(spark):
    b1 = spark.createDataFrame(
        [
            ("r1", "alpha", "ok", _ts("2024-01-01")),
            ("r2", "beta", "ok", _ts("2024-01-01")),
            ("r3", "gamma", None, _ts("2024-01-01")),  # NULL attribute
        ],
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            ("r1", "alpha", "ok", _ts("2024-02-10")),      # unchanged → no-op
            ("r2", "beta2", "ok", _ts("2024-02-10")),      # changed → expire+insert
            ("r3", "gamma", "fixed", _ts("2024-02-10")),   # NULL→value transition
            ("r4", "delta", "ok", _ts("2024-02-10")),      # new key → insert
        ],
        SCHEMA,
    )
    return b1, b2


def test_initial_load(spark, batches):
    b1, _ = batches
    t = M.initial_load(b1, ["ResourceId"], "PreciseTimeStamp")
    rows = {r.ResourceId: r for r in t.collect()}
    assert all(r.currentVersion == 1 for r in rows.values())
    assert all(r.expirationDate == 20991231 for r in rows.values())
    assert rows["r1"].effectiveDate == 20240101


def test_merge_batch_semantics(spark, batches):
    b1, b2 = batches
    t = M.initial_load(b1, ["ResourceId"], "PreciseTimeStamp")
    t2 = M.apply_changeset(t, b2, ["ResourceId"], "PreciseTimeStamp").cache()

    validate_scd2(t2, ["ResourceId"])
    by = {(r.ResourceId, r.currentVersion): r for r in t2.collect()}

    # r1 unchanged: single row, still current, untouched expiration
    assert t2.filter(F.col("ResourceId") == "r1").count() == 1
    assert by[("r1", 1)].expirationDate == 20991231

    # r2 changed: old version expired the day before the new effective
    assert by[("r2", 0)].Name == "beta" and by[("r2", 0)].expirationDate == 20240209
    assert by[("r2", 1)].Name == "beta2" and by[("r2", 1)].effectiveDate == 20240210

    # r3: NULL→value must be detected as a change (null-safe hash, the
    # fix over the reference's `=`-based WHERE NOT)
    assert by[("r3", 0)].Status is None
    assert by[("r3", 1)].Status == "fixed"

    # r4 new key inserted
    assert by[("r4", 1)].effectiveDate == 20240210


def test_merge_idempotent_on_unchanged(spark, batches):
    b1, b2 = batches
    t = M.initial_load(b1, ["ResourceId"], "PreciseTimeStamp")
    t2 = M.apply_changeset(t, b2, ["ResourceId"], "PreciseTimeStamp")
    # replaying the same changeset with a later timestamp: all rows now
    # match current state → no new versions
    b2_replay = b2.withColumn(
        "PreciseTimeStamp", F.lit(_ts("2024-03-01")).cast("timestamp")
    )
    t3 = M.apply_changeset(t2, b2_replay, ["ResourceId"], "PreciseTimeStamp")
    assert t3.count() == t2.count()
    validate_scd2(t3, ["ResourceId"])


def test_schema_drift_reconcile(spark, batches):
    b1, _ = batches
    t = M.initial_load(b1, ["ResourceId"], "PreciseTimeStamp")
    b3 = spark.createDataFrame(
        [("r1", "alpha", "ok", _ts("2024-03-05"), "new-attr")],
        SCHEMA + ", NewAttr string",
    )
    t_reconciled = M.reconcile_schema(t, b3)
    assert "NewAttr" in t_reconciled.columns
    t3 = M.apply_changeset(t_reconciled, b3, ["ResourceId"], "PreciseTimeStamp")
    validate_scd2(t3, ["ResourceId"])
    cur_r1 = t3.filter((F.col("ResourceId") == "r1") & (F.col("currentVersion") == 1)).collect()[0]
    assert cur_r1.NewAttr == "new-attr"  # drifted column flows through
    old_r1 = t3.filter((F.col("ResourceId") == "r1") & (F.col("currentVersion") == 0)).collect()[0]
    assert old_r1.NewAttr is None


def test_shrink_types_plan(spark):
    df = spark.createDataFrame(
        [(1, 100, 40000, 3_000_000_000)], "a long, b long, c long, d long"
    )
    plan = P.plan_shrink_types(df, ["a", "b", "c", "d"])
    assert plan == {"a": "tinyint", "b": "tinyint", "c": "int", "d": "bigint"}
