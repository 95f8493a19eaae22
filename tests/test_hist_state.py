"""Mergeable histogram state (incremental 'hist' kind) + quantile
finalizer: merge==full, hand-value interpolation, streaming fold."""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators import incremental as I

BOUNDS = [10.0, 20.0, 30.0, 40.0]
SPEC = {"n": ("count", None), "h": ("hist", ("v", BOUNDS))}


def test_hist_merge_equals_full(spark):
    rows = [("a", float(v)) for v in range(50)] + [("b", float(v % 25)) for v in range(40)]
    df = spark.createDataFrame(rows, "k string, v double")
    full = I.aggregate_batch(df, ["k"], SPEC)
    b1 = df.filter(F.col("v") < 15)
    b2 = df.filter(F.col("v") >= 15)
    merged = I.merge_states(
        [I.aggregate_batch(b1, ["k"], SPEC), I.aggregate_batch(b2, ["k"], SPEC)],
        ["k"], SPEC,
    )
    f = {r["k"]: (r["n"], r["h"]) for r in full.collect()}
    m = {r["k"]: (r["n"], r["h"]) for r in merged.collect()}
    assert f == m
    # bucket counts partition the rows
    assert sum(f["a"][1]) == 50


def test_hist_quantiles_hand_values(spark):
    # uniform 0..49 for key a: bucket counts [10,10,10,10,10]
    df = spark.createDataFrame([("a", float(v)) for v in range(50)], "k string, v double")
    state = I.aggregate_batch(df, ["k"], SPEC)
    q = I.hist_quantiles(state, "h", BOUNDS, [0.5, 0.9]).first()
    # median: target 25 -> bucket 2 ([20,30)), before=20, frac=0.5 -> 25
    assert q["q5"] == pytest.approx(25.0)
    # p90: target 45 -> last bucket clamps to the top boundary
    assert q["q9"] == pytest.approx(40.0)


def test_hist_quantiles_edge_clamp(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    state = I.aggregate_batch(df, ["k"], SPEC)
    q = I.hist_quantiles(state, "h", BOUNDS, [0.5]).first()
    assert q["q5"] == pytest.approx(10.0)  # all below first boundary


def test_stream_hist_rollup_equals_batch(spark, tmp_path):
    import os

    from azuredataengineering_deeplearning_spark.streaming import (
        run_until_drained, stream_rollup,
    )

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    schema = "k string, v double"

    def drop(name, vals):
        with open(f"{landing}/{name}", "w") as f:
            f.write("k,v\n")
            for k, v in vals:
                f.write(f"{k},{v}\n")

    drop("b1.csv", [("a", float(v)) for v in range(25)])
    run_until_drained(stream_rollup(
        spark.readStream.schema(schema).option("header", "true").csv(landing),
        ["k"], SPEC, state, ckpt))
    drop("b2.csv", [("a", float(v)) for v in range(25, 50)])
    run_until_drained(stream_rollup(
        spark.readStream.schema(schema).option("header", "true").csv(landing),
        ["k"], SPEC, state, ckpt))

    got = I.hist_quantiles(
        I.finalize_state(spark.read.parquet(state), SPEC), "h", BOUNDS, [0.5]
    ).first()
    assert got["q5"] == pytest.approx(25.0)
    assert got["n"] == 50


def test_hll_state_merge_and_stream(spark, tmp_path):
    import os

    from azuredataengineering_deeplearning_spark.streaming import (
        run_until_drained, stream_rollup,
    )

    spec = {"n": ("count", None), "uniq": ("hll", "u")}
    rows = [("a", f"user{i % 30}") for i in range(100)]
    df = spark.createDataFrame(rows, "k string, u string")
    # merge of halves == full
    full = I.finalize_state(I.aggregate_batch(df, ["k"], spec), spec).first()
    b1, b2 = df.limit(50), df.subtract(df.limit(50))
    merged = I.finalize_state(
        I.merge_states(
            [I.aggregate_batch(b1, ["k"], spec), I.aggregate_batch(df.exceptAll(b1), ["k"], spec)],
            ["k"], spec,
        ),
        spec,
    ).first()
    assert round(full["uniq"]) == 30
    assert round(merged["uniq"]) == 30

    # streaming fold across two micro-batches
    landing = str(tmp_path / "hll_landing")
    state = str(tmp_path / "hll_state")
    ckpt = str(tmp_path / "hll_ckpt")
    os.makedirs(landing)

    def drop(name, users):
        with open(f"{landing}/{name}", "w") as f:
            f.write("k,u\n")
            for u in users:
                f.write(f"a,{u}\n")

    drop("b1.csv", [f"user{i}" for i in range(20)])
    run_until_drained(stream_rollup(
        spark.readStream.schema("k string, u string").option("header", "true").csv(landing),
        ["k"], spec, state, ckpt))
    drop("b2.csv", [f"user{i}" for i in range(10, 40)])  # overlap 10..19
    run_until_drained(stream_rollup(
        spark.readStream.schema("k string, u string").option("header", "true").csv(landing),
        ["k"], spec, state, ckpt))
    got = I.finalize_state(spark.read.parquet(state), spec).first()
    assert round(got["uniq"]) == 40
    assert got["n"] == 50


@pytest.mark.slow
def test_hist_quantiles_properties(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(vals=st.lists(st.floats(-5, 60, allow_nan=False, width=32),
                         min_size=1, max_size=50))
    def prop(vals):
        df = spark.createDataFrame([("a", float(v)) for v in vals],
                                   "k string, v double")
        state = I.aggregate_batch(df, ["k"], SPEC)
        q = I.hist_quantiles(state, "h", BOUNDS, [0.1, 0.5, 0.9]).first()
        # estimates clamp to the boundary range and are monotone in p
        assert BOUNDS[0] <= q["q1"] <= BOUNDS[-1]
        assert q["q1"] <= q["q5"] + 1e-9 and q["q5"] <= q["q9"] + 1e-9

    prop()


def test_psi_from_hists(spark):
    # identical distributions -> psi ~ 0; shifted -> psi grows
    same = [("a", float(v % 50)) for v in range(200)]
    shifted = [("a", float(v % 50) ) for v in range(200)]
    far = [("a", 40.0 + float(v % 10)) for v in range(200)]
    mk = lambda rows: I.aggregate_batch(
        spark.createDataFrame(rows, "k string, v double"), ["k"], SPEC)
    r = I.psi_from_hists(mk(same), mk(shifted), ["k"], "h").first()
    assert r["psi"] == pytest.approx(0.0, abs=1e-9)
    assert r["n_ref"] == 200 and r["n_cur"] == 200
    r2 = I.psi_from_hists(mk(same), mk(far), ["k"], "h").first()
    assert r2["psi"] > 1.0  # gross shift


def test_ks_from_hists(spark):
    mk = lambda rows: I.aggregate_batch(
        spark.createDataFrame(rows, "k string, v double"), ["k"], SPEC)
    same = [("a", float(v % 50)) for v in range(200)]
    far = [("a", 45.0) for _ in range(200)]  # all mass in last bucket
    r0 = I.ks_from_hists(mk(same), mk(same), ["k"], "h").first()
    assert r0["ks"] == pytest.approx(0.0)
    r1 = I.ks_from_hists(mk(same), mk(far), ["k"], "h").first()
    # ref CDF at edge 40: 40/50 = 0.8; cur CDF there: 0 -> ks = 0.8
    assert r1["ks"] == pytest.approx(0.8)


def test_psi_ks_symmetry(spark):
    import random

    rng = random.Random(3)
    a = [("k", float(rng.uniform(0, 50))) for _ in range(150)]
    b = [("k", float(rng.uniform(10, 45))) for _ in range(120)]
    mk = lambda rows: I.aggregate_batch(
        spark.createDataFrame(rows, "k string, v double"), ["k"], SPEC)
    sa, sb = mk(a), mk(b)
    p_ab = I.psi_from_hists(sa, sb, ["k"], "h").first()["psi"]
    p_ba = I.psi_from_hists(sb, sa, ["k"], "h").first()["psi"]
    assert p_ab == pytest.approx(p_ba)      # PSI is symmetric
    k_ab = I.ks_from_hists(sa, sb, ["k"], "h").first()["ks"]
    k_ba = I.ks_from_hists(sb, sa, ["k"], "h").first()["ks"]
    assert k_ab == pytest.approx(k_ba)      # KS is symmetric
    assert 0.0 <= k_ab <= 1.0
