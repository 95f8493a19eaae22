"""Hypothesis property tests for the round-3 evaluation/tune operators
(SURVEY §5.3 posture: invariants over random small frames)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azuredataengineering_deeplearning_spark.operators import ml as ML
from azuredataengineering_deeplearning_spark.operators import sft as SFT

import pytest

pytestmark = pytest.mark.slow  # heavy differential/fuzz suite: deselected by default (pytest.ini), run with -m ""


_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_scored_rows = st.lists(
    st.tuples(st.integers(0, 1), st.floats(0, 1, allow_nan=False, width=32)),
    min_size=4,
    max_size=40,
).filter(lambda rs: {r[0] for r in rs} == {0, 1})


@given(rows=_scored_rows)
@_slow
def test_auc_bounded_and_complement(spark, rows):
    df = spark.createDataFrame(rows, "y int, s double")
    r = ML.binary_auc(df, "y", "s").first()
    assert 0.0 <= r["auc"] <= 1.0
    assert r["n_pos"] + r["n_neg"] == len(rows)
    # label flip mirrors AUC around 0.5
    flipped = spark.createDataFrame([(1 - y, s) for y, s in rows], "y int, s double")
    r2 = ML.binary_auc(flipped, "y", "s").first()
    assert abs((r["auc"] + r2["auc"]) - 1.0) < 1e-9


@given(rows=_scored_rows)
@_slow
def test_threshold_sweep_recall_monotone(spark, rows):
    df = spark.createDataFrame(rows, "y int, s double")
    sweep = ML.threshold_sweep(df, "y", "s").collect()
    by_thr = sorted(sweep, key=lambda r: -r["threshold"])
    recalls = [r["recall"] for r in by_thr]
    assert all(a <= b + 1e-12 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0  # lowest threshold predicts everything positive
    assert all(0 <= r["precision"] <= 1 for r in sweep)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.floats(-100, 100, allow_nan=False, width=32),
            st.floats(-100, 100, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=30,
    )
)
@_slow
def test_kendall_tau_bounded_and_antisymmetric(spark, rows):
    df = spark.createDataFrame(rows, "g int, x double, y double")
    taus = {r["g"]: r["tau_b"] for r in
            ML.kendall_tau_b(df, ["g"], "x", "y").collect()}
    assert all(-1.0 - 1e-9 <= t <= 1.0 + 1e-9 for t in taus.values())
    neg = spark.createDataFrame([(g, x, -y) for g, x, y in rows],
                                "g int, x double, y double")
    taus_neg = {r["g"]: r["tau_b"] for r in
                ML.kendall_tau_b(neg, ["g"], "x", "y").collect()}
    for g in taus:
        assert abs(taus[g] + taus_neg[g]) < 1e-9


_texts = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           max_codepoint=0x7F),
    min_size=1,
    max_size=20,
)


@given(
    rows=st.lists(st.tuples(_texts, _texts), min_size=1, max_size=20),
    eval_frac=st.sampled_from([0.1, 0.2, 0.5]),
)
@_slow
def test_sft_prepare_invariants(spark, rows, eval_frac):
    df = spark.createDataFrame(rows, "q string, a string")
    out = SFT.sft_prepare(df, "q", "a", template="qa_markers",
                          eval_frac=eval_frac).collect()
    # one row per distinct (q, a) pair
    assert len(out) == len(set(rows))
    for r in out:
        assert r["q"] in r["text"] and r["a"] in r["text"]
        assert r["split"] in (0, 1)
    # same q always lands in the same split (leakage-free by key)
    by_q = {}
    for r in out:
        by_q.setdefault(r["q"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_q.values())
