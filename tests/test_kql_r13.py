"""Round-13 series-library completion pins: elementwise trig/pow,
vector ops (dot/magnitude/cosine), directional fills, seasonal
(median), fit_2lines, fit_poly — edge semantics the catalog rows don't
reach (empty/null inputs, unequal lengths, degree validation, the
n < 4 guard, autodetect in seasonal)."""

import math

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(
        [
            (1, [3.0, 1.0, 4.0, 1.0, 5.0, 9.0], [2.0, 7.0, 1.0, 8.0]),
            (2, [], [1.0, 1.0]),
            (3, None, [2.0, 2.0]),
        ],
        "rid int, a array<double>, b array<double>",
    )


def _one(tdf, expr):
    return kql_to_df(
        {"T": tdf}, f"T | where rid == 1 | extend r = {expr} | project r"
    ).collect()[0]["r"]


def test_vector_ops_shorter_length_and_values(spark, tdf):
    # dot over the shorter length (4): 3*2 + 1*7 + 4*1 + 1*8 = 25
    assert _one(tdf, "series_dot_product(a, b)") == 25.0
    assert _one(tdf, "series_magnitude(b)") == pytest.approx(
        math.sqrt(4 + 49 + 1 + 64)
    )
    cs = _one(tdf, "series_cosine_similarity(a, b)")
    na = math.sqrt(9 + 1 + 16 + 1)
    assert cs == pytest.approx(25.0 / (na * math.sqrt(118)))


def test_vector_ops_empty_and_null_inputs(spark, tdf):
    out = kql_to_df(
        {"T": tdf},
        "T | extend d = series_dot_product(a, b),"
        " m = series_magnitude(a), c = series_cosine_similarity(a, b)"
        " | project rid, d, m, c",
    ).collect()
    got = {r["rid"]: (r["d"], r["m"], r["c"]) for r in out}
    assert got[2] == (None, None, None)  # empty array
    assert got[3] == (None, None, None)  # null array


def test_cosine_similarity_zero_magnitude_is_null(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0], [1.0, 2.0])], "rid int, a array<double>, b array<double>"
    )
    assert _one(df, "series_cosine_similarity(a, b)") is None


def test_fill_forward_backward_edges(spark):
    df = spark.createDataFrame(
        [(1, [None, None, 3.0, None, 5.0, None])],
        "rid int, a array<double>",
    )
    out = kql_to_df(
        {"T": df},
        "T | extend f = series_fill_forward(a), b = series_fill_backward(a)"
        " | project f, b",
    ).collect()[0]
    assert out["f"] == [None, None, 3.0, 3.0, 5.0, 5.0]
    assert out["b"] == [3.0, 3.0, 3.0, 5.0, 5.0, None]
    # all-null stays all-null, empty stays empty
    df2 = spark.createDataFrame(
        [(1, [None, None]), (2, [])], "rid int, a array<double>"
    )
    out2 = kql_to_df(
        {"T": df2},
        "T | extend f = series_fill_forward(a), b = series_fill_backward(a)"
        " | project rid, f, b",
    ).collect()
    got = {r["rid"]: (r["f"], r["b"]) for r in out2}
    assert got[1] == ([None, None], [None, None])
    assert got[2] == ([], [])


def test_seasonal_median_and_autodetect(spark):
    # period 2: even phase [1,3,5] median 3; odd [10,30] median 20
    df = spark.createDataFrame(
        [(1, [1.0, 10.0, 3.0, 30.0, 5.0])], "rid int, a array<double>"
    )
    out = _one(df, "series_seasonal(a, 2)")
    assert out == [3.0, 20.0, 3.0, 20.0, 3.0]
    # autodetect (-1): a strongly period-2 series detects 2; a flat
    # series detects nothing -> zeros
    df2 = spark.createDataFrame(
        [(1, [0.0, 8.0] * 6), (2, [4.0] * 12)], "rid int, a array<double>"
    )
    out2 = kql_to_df(
        {"T": df2},
        "T | extend s = series_seasonal(a) | project rid, s",
    ).collect()
    got = {r["rid"]: r["s"] for r in out2}
    assert got[1] == [0.0, 8.0] * 6
    assert got[2] == [0.0] * 12


def test_fit_2lines_knee_and_guard(spark):
    # piecewise: flat 5 then slope +2 from index 4 -> split at 4
    ys = [5.0, 5.0, 5.0, 5.0, 5.0, 7.0, 9.0, 11.0, 13.0]
    df = spark.createDataFrame([(1, ys)], "rid int, a array<double>")
    f = _one(df, "series_fit_2lines_dynamic(a)")
    # the best split puts the breakpoint where the slope changes; the
    # flat prefix has slope ~0 and the right segment slope ~2
    assert 4 <= f["split_idx"] <= 5
    assert f["left_slope"] == pytest.approx(0.0, abs=0.2)
    assert f["right_slope"] == pytest.approx(2.0, abs=0.2)
    assert f["rsquare"] > 0.95
    # n < 4 -> null struct
    df2 = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "rid int, a array<double>")
    assert _one(df2, "series_fit_2lines_dynamic(a)") is None


def test_fit_poly_exact_quadratic_and_degree_guard(spark):
    # exact quadratic y = 2x^2 - 3x + 1 recovered to float precision
    ys = [2.0 * i * i - 3.0 * i + 1.0 for i in range(7)]
    df = spark.createDataFrame([(1, ys)], "rid int, a array<double>")
    f = _one(df, "series_fit_poly(a, 2)")
    c2, c1, c0 = f["coefficients"]
    assert (c2, c1, c0) == (
        pytest.approx(2.0), pytest.approx(-3.0), pytest.approx(1.0)
    )
    assert f["rsquare"] == pytest.approx(1.0)
    assert f["poly_fit"][3] == pytest.approx(ys[3])
    # degree 1 delegates to the line fit (2 coefficients)
    f1 = _one(df, "series_fit_poly(a, 1)")
    assert len(f1["coefficients"]) == 2
    # unsupported degree raises at translate time, loudly
    with pytest.raises(ValueError, match="degree 1 or 2"):
        kql_to_df({"T": df}, "T | extend f = series_fit_poly(a, 3)")


def test_trig_and_pow_elementwise(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0], [2.0, 0.5])], "rid int, a array<double>, b array<double>"
    )
    out = kql_to_df(
        {"T": df},
        "T | extend s = series_sin(a), c = series_cos(a),"
        " t2 = series_tan(a), ac = series_acos(a), as2 = series_asin(a),"
        " at = series_atan(a), p = series_pow(b, a)"
        " | project s, c, t2, ac, as2, at, p",
    ).collect()[0]
    assert out["s"] == [pytest.approx(0.0), pytest.approx(math.sin(1.0))]
    assert out["c"] == [pytest.approx(1.0), pytest.approx(math.cos(1.0))]
    assert out["ac"][0] == pytest.approx(math.pi / 2)
    assert out["p"] == [pytest.approx(1.0), pytest.approx(0.5)]


def test_fft_matches_numpy_and_roundtrips(spark):
    import numpy as np

    y = [1.0, 2.0, -1.5, 0.5, 3.0, -2.0, 4.25]
    im0 = [0.5, -1.0, 0.0, 2.0, -0.25, 1.5, 0.75]
    df = spark.createDataFrame(
        [(1, y, im0)], "rid int, y array<double>, z array<double>"
    )
    out = kql_to_df(
        {"T": df},
        "T | extend f = series_fft(y), g = series_fft(y, z)"
        " | extend rt = series_ifft(f.re, f.im)"
        " | project f, g, rt",
    ).collect()[0]
    npf = np.fft.fft(np.array(y))
    npg = np.fft.fft(np.array(y) + 1j * np.array(im0))
    assert out["f"]["re"] == pytest.approx(list(npf.real), abs=1e-9)
    assert out["f"]["im"] == pytest.approx(list(npf.imag), abs=1e-9)
    # complex (2-arg) input
    assert out["g"]["re"] == pytest.approx(list(npg.real), abs=1e-9)
    assert out["g"]["im"] == pytest.approx(list(npg.imag), abs=1e-9)
    # ifft(fft(y)) == y, imaginary residue at float noise
    assert out["rt"]["re"] == pytest.approx(y, abs=1e-9)
    assert max(abs(v) for v in out["rt"]["im"]) < 1e-12


def test_fft_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, []), (2, None)], "rid int, y array<double>"
    )
    out = kql_to_df(
        {"T": df}, "T | extend f = series_fft(y) | project rid, f"
    ).collect()
    assert all(r["f"] is None for r in out)
