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
