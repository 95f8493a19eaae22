"""Pins for the round-12 KQL series_decompose family
(operators/timeseries.py: series_decompose_sql,
series_decompose_forecast_sql, series_periods_detect_sql, and the
seasonal upgrade of series_decompose_anomalies_sql).

Residual/period invariants (r11 verdict ask #4): exact arithmetic
identities (baseline + residual ≡ series, p-periodic seasonal), exact
recovery of a pure periodic signal with trend='none', planted-period
autodetection (and refusal on noise), forecast ≡ prefix-decompose
baseline on the training region, and the loud-error surface.
"""

import math
import random

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _one(spark, vals, pipe):
    df = spark.createDataFrame([(1, vals)], "rid int, y array<double>")
    return kql_to_df({"T": df}, pipe).collect()[0]


SEAS4 = [4.0, -2.0, 1.0, -3.0]  # integer-valued, sums to 0


def _seasonal_series(n, slope=0.25, icpt=2.0):
    return [icpt + slope * i + SEAS4[i % 4] for i in range(n)]


def test_decompose_identity_and_periodicity(spark):
    y = _seasonal_series(20)
    r = _one(
        spark, y,
        "T | extend d = series_decompose(y, 4)"
        " | project b = d.baseline, s = d.seasonal, t = d.trend,"
        " re = d.residual",
    )
    n = len(y)
    assert len(r["b"]) == len(r["s"]) == len(r["t"]) == len(r["re"]) == n
    # float-exact identities: baseline = trend + seasonal (same zip),
    # residual = y - baseline
    for i in range(n):
        assert r["b"][i] == r["t"][i] + r["s"][i]
        assert r["re"][i] == y[i] - r["b"][i]
    # the seasonal component is EXACTLY p-periodic (one value per class)
    for i in range(n):
        assert r["s"][i] == r["s"][i % 4]


def test_decompose_pure_periodic_exact(spark):
    # no trend, integer-valued periodic signal: class means reproduce
    # it exactly -> residual is exactly 0 everywhere
    y = [SEAS4[i % 4] for i in range(16)]
    r = _one(
        spark, y,
        "T | extend d = series_decompose(y, 4, 'none')"
        " | project s = d.seasonal, t = d.trend, re = d.residual",
    )
    assert all(t == 0.0 for t in r["t"])
    assert r["s"][:4] == SEAS4
    assert all(v == 0.0 for v in r["re"])


def test_decompose_period_zero_no_seasonal(spark):
    y = _seasonal_series(12)
    r = _one(
        spark, y,
        "T | extend d = series_decompose(y, 0)"
        " | project s = d.seasonal, b = d.baseline, t = d.trend",
    )
    assert all(v == 0.0 for v in r["s"])
    assert r["b"] == r["t"]


def test_decompose_autodetect_planted_and_noise(spark):
    y = _seasonal_series(24)
    auto = _one(
        spark, y,
        "T | extend d = series_decompose(y)"
        " | project s = d.seasonal, re = d.residual",
    )
    explicit = _one(
        spark, y,
        "T | extend d = series_decompose(y, 4)"
        " | project s = d.seasonal, re = d.residual",
    )
    # -1 autodetection lands on the planted period: identical output
    assert auto["s"] == explicit["s"] and auto["re"] == explicit["re"]
    # deterministic "noise" (no period): seasonality gate refuses,
    # decompose degrades to trend-only
    rng = random.Random(7)
    noise = [round(rng.uniform(-1, 1), 3) for _ in range(24)]
    rn = _one(
        spark, noise,
        "T | extend d = series_decompose(y)"
        " | project s = d.seasonal, b = d.baseline, t = d.trend",
    )
    assert all(v == 0.0 for v in rn["s"])
    assert rn["b"] == rn["t"]


def test_periods_detect_planted_and_constant(spark):
    y = [SEAS4[i % 4] for i in range(24)]
    r = _one(
        spark, y,
        "T | extend p = series_periods_detect(y, 2, 10, 3)"
        " | project pe = p.periods, sc = p.scores",
    )
    assert r["pe"][0] == 4.0 and len(r["pe"]) <= 3
    assert all(0 < s <= 1.0 + 1e-12 for s in r["sc"])
    assert r["sc"] == sorted(r["sc"], reverse=True)
    # a harmonic of the true period scores high too, but rank 0 is 4
    c = _one(
        spark, [5.0] * 12,
        "T | extend p = series_periods_detect(y, 2, 6, 2)"
        " | project pe = p.periods, sc = p.scores",
    )
    assert c["pe"] == [] and c["sc"] == []


def test_forecast_matches_prefix_decompose_baseline(spark):
    y = _seasonal_series(24)
    f = _one(
        spark, y,
        "T | extend f = series_decompose_forecast(y, 8, 4) | project f",
    )["f"]
    assert len(f) == 24
    prefix = _one(
        spark, y[:16],
        "T | extend d = series_decompose(y, 4) | project b = d.baseline",
    )["b"]
    # the training region of the forecast IS the prefix decompose
    # baseline (same fit, same class means, same arithmetic)
    assert f[:16] == prefix
    # the trailing 8 out-of-sample points extend the same model:
    # close to the actual generating process (one-pass model bias only)
    for i in range(16, 24):
        assert abs(f[i] - y[i]) < 3.0


def test_anomalies_seasonal_flags_planted_spike(spark):
    y = _seasonal_series(28)
    y[17] += 50.0  # planted spike
    r = _one(
        spark, y,
        "T | extend a = series_decompose_anomalies(y, 1.5, 4)"
        " | project ad = a.anomalies, sc = a.score",
    )
    # the spike is flagged high and carries the max score (a one-pass
    # non-robust model also shifts neighbors' fences, so OTHER bins may
    # flag too — the pin is the spike itself, not exclusivity)
    assert r["ad"][17] == 1
    assert r["sc"][17] == max(r["sc"])
    assert r["sc"][17] > 1.5


def test_decompose_errors_loud(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "rid int, y array<double>")
    with pytest.raises(ValueError, match="trend"):
        kql_to_df(
            {"T": df},
            "T | extend d = series_decompose(y, 4, 'cubic') | project d",
        )
    with pytest.raises(ValueError, match="series_decompose"):
        kql_to_df(
            {"T": df},
            "T | extend d = series_decompose(y, 4, 'avg', 3, 0.5)"
            " | project d",
        )


def test_decompose_empty_and_forecast_overlong_null(spark):
    df = spark.createDataFrame(
        [(1, []), (2, [1.0, 2.0])], "rid int, y array<double>"
    )
    out = kql_to_df(
        {"T": df},
        "T | extend d = series_decompose(y, 2),"
        " f = series_decompose_forecast(y, 5, 2)"
        " | project rid, d, f",
    ).collect()
    by = {r["rid"]: r for r in out}
    assert by[1]["d"] is None and by[1]["f"] is None
    # points >= length -> empty training prefix -> null forecast
    assert by[2]["f"] is None and by[2]["d"] is not None


def test_periods_validate_scores_match_detect(spark):
    y = [SEAS4[i % 4] for i in range(24)]
    det = _one(
        spark, y,
        "T | extend p = series_periods_detect(y, 2, 8, 4)"
        " | project pe = p.periods, sc = p.scores",
    )
    val = _one(
        spark, y,
        "T | extend p = series_periods_validate(y, 4, 8)"
        " | project pe = p.periods, sc = p.scores",
    )
    # validate scores the proposed periods with the SAME measure detect
    # ranks by — cross-checkable value for value
    det_scores = dict(zip(det["pe"], det["sc"]))
    assert val["pe"] == [4.0, 8.0]
    assert val["sc"][0] == det_scores[4.0]
    assert val["sc"][1] == det_scores[8.0]
    # out-of-range period scores 0; at least one period arg required
    edge = _one(
        spark, y,
        "T | extend p = series_periods_validate(y, 100)"
        " | project sc = p.scores",
    )
    assert edge["sc"] == [0.0]
    import pytest as _pt

    df = spark.createDataFrame([(1, [1.0])], "rid int, y array<double>")
    with _pt.raises(ValueError, match="at least one period"):
        kql_to_df(
            {"T": df},
            "T | extend p = series_periods_validate(y) | project p",
        )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


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
        max_size=20,
    ),
    p=st.integers(-1, 25),
    trend=st.sampled_from(["linefit", "avg", "none"]),
)
def test_decompose_structural_invariants_arbitrary_input(
    spark, ys, p, trend
):
    """Arbitrary input (incl. NaN/Inf elements, period > length,
    autodetect on junk): no exception, all four components keep the
    input length, and baseline = trend + seasonal HOLDS ELEMENTWISE
    under IEEE semantics (it is literally the same zip) wherever both
    operands are finite."""
    import math

    r = _one(
        spark, ys,
        f"T | extend d = series_decompose(y, {p}, '{trend}')"
        " | project b = d.baseline, s = d.seasonal, t = d.trend,"
        " re = d.residual",
    )
    n = len(ys)
    assert len(r["b"]) == len(r["s"]) == len(r["t"]) == len(r["re"]) == n
    for i in range(n):
        ti, si, bi = r["t"][i], r["s"][i], r["b"][i]
        if (
            ti is not None and si is not None
            and math.isfinite(ti) and math.isfinite(si)
        ):
            assert bi == ti + si
        if (
            bi is not None and math.isfinite(bi)
            and math.isfinite(ys[i])
        ):
            assert r["re"][i] == ys[i] - bi
