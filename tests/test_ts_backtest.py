"""Rolling-origin backtest + model selection (operators/timeseries.py
backtest_models / select_best_model)."""

import datetime as dt

import pytest

from azuredataengineering_deeplearning_spark.operators import timeseries as TS


@pytest.fixture(scope="module")
def panel(spark):
    rows = []
    base = dt.date(2024, 1, 1)
    for i in range(60):
        rows.append(("flat", base + dt.timedelta(days=i), 10.0))
        rows.append(("trend", base + dt.timedelta(days=i), float(i)))
        rows.append(("weekly", base + dt.timedelta(days=i), float(i % 7)))
    return spark.createDataFrame(rows, "uid string, d date, y double")


def test_backtest_models_shapes_and_no_lookahead(panel):
    bt = TS.backtest_models(
        panel, ["uid"], "d", "y", horizon=7, eval_points=14, season=7
    )
    rows = {(r["uid"], r["model"]): r for r in bt.collect()}
    assert len(rows) == 9  # 3 series x 3 models
    # flat series: every model predicts exactly 10 -> zero error
    assert rows[("flat", "trailing_mean")]["mae"] == 0.0
    assert rows[("flat", "linear_trend")]["mae"] == pytest.approx(0.0, abs=1e-9)
    assert rows[("flat", "seasonal_naive")]["mae"] == 0.0
    # pure weekly cycle: seasonal naive is exact, trailing mean is not
    assert rows[("weekly", "seasonal_naive")]["mae"] == 0.0
    assert rows[("weekly", "trailing_mean")]["mae"] > 0.5
    # pure trend: linear wins, seasonal naive lags by exactly 7
    assert rows[("trend", "linear_trend")]["mae"] == pytest.approx(0.0, abs=1e-9)
    assert rows[("trend", "seasonal_naive")]["mae"] == pytest.approx(7.0)
    assert all(r["n_eval"] == 14 for r in rows.values())


def test_backtest_requires_season_covering_horizon(panel):
    with pytest.raises(AssertionError):
        TS.backtest_models(panel, ["uid"], "d", "y", horizon=8, season=7)


def test_select_best_model_per_series(panel):
    bt = TS.backtest_models(
        panel, ["uid"], "d", "y", horizon=7, eval_points=14, season=7
    )
    best = {r["uid"]: r["model"] for r in
            TS.select_best_model(bt, ["uid"]).collect()}
    assert best["weekly"] == "seasonal_naive"
    assert best["trend"] == "linear_trend"
    # flat: three-way exact tie -> lexicographic tie-break
    assert best["flat"] == "linear_trend"


def test_ensemble_forecast_weighted(panel):
    bt = TS.backtest_models(
        panel, ["uid"], "d", "y", horizon=7, eval_points=14, season=7
    )
    fc = TS.ensemble_forecast(
        panel, ["uid"], "d", "y", horizon=7, season=7, backtest=bt
    )
    rows = {(r["uid"], r["k"]): r for r in fc.collect()}
    assert len(rows) == 21  # 3 series x 7 steps
    # flat series: every candidate says 10 -> ensemble exactly 10
    assert rows[("flat", 1)]["yhat"] == pytest.approx(10.0, abs=1e-9)
    # weekly cycle: snaive has mae 0 -> weight 1/eps dominates, so the
    # ensemble hugs the seasonal prediction
    r = rows[("weekly", 3)]
    # snaive at step k reads rn = n - season + k = 56 -> y = (56-1) % 7
    assert r["yhat_snaive"] == pytest.approx(6.0)
    assert abs(r["yhat"] - r["yhat_snaive"]) < 0.1
    # trend series: linear candidate extrapolates exactly
    assert rows[("trend", 5)]["yhat_linear"] == pytest.approx(64.0, abs=1e-6)


def test_ensemble_forecast_equal_weights_and_dates(panel):
    fc = TS.ensemble_forecast(panel, ["uid"], "d", "y", horizon=3, season=7)
    rows = [r for r in fc.collect() if r["uid"] == "flat"]
    assert sorted(r["k"] for r in rows) == [1, 2, 3]
    ds = sorted(r["ds"] for r in rows)
    assert (ds[1] - ds[0]).days == 1 and (ds[2] - ds[1]).days == 1
    assert all(r["yhat"] == pytest.approx(10.0, abs=1e-9) for r in rows)


def test_tune_seasonal_period_grid(panel):
    tuned = TS.tune_seasonal_period(
        panel, ["uid"], "d", "y", seasons=[1, 7, 14], eval_points=14
    )
    rows = {(r["uid"], r["season"]): r["mae"] for r in tuned.collect()}
    assert len(rows) == 9
    # weekly cycle: lag-7 and lag-14 are exact, lag-1 is not
    assert rows[("weekly", 7)] == 0.0 and rows[("weekly", 14)] == 0.0
    assert rows[("weekly", 1)] > 0.5
    # pure trend: shorter lag = smaller bias (mae == season)
    assert rows[("trend", 1)] == pytest.approx(1.0)
    assert rows[("trend", 7)] == pytest.approx(7.0)


def test_mann_kendall_trend_signs(panel):
    mk = {r["uid"]: r for r in
          TS.mann_kendall_trend(panel, ["uid"], "d", "y").collect()}
    # strictly increasing: S = n(n-1)/2, tau_b = 1
    t = mk["trend"]
    assert t["s_stat"] == 60 * 59 // 2 and t["tau_b"] == pytest.approx(1.0)
    assert t["z"] > 5
    # constant series: all ties -> S=0, var 0, z 0
    f = mk["flat"]
    assert f["s_stat"] == 0 and f["z"] == 0.0 and f["tau_b"] == 0.0
    # weekly cycle: no monotone drift -> |tau| small
    assert abs(mk["weekly"]["tau_b"]) < 0.1


def test_ensemble_forecast_single_point_series(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("solo", dt.date(2024, 1, 1), 42.0)], "uid string, d date, y double"
    )
    rows = TS.ensemble_forecast(df, ["uid"], "d", "y", horizon=2, season=7).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["yhat_snaive"] is None       # no seasonal history
        assert r["yhat_mean"] == 42.0
        assert r["yhat_linear"] == 42.0       # zero-slope fallback = mean
        assert r["yhat"] == pytest.approx(42.0)
