import pytest
import datetime as dt

import pyspark.sql.functions as F

from azuredataengineering_deeplearning_spark.operators import timeseries as TS


def test_spine_dense_and_clamped(spark):
    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 1.0), ("a", dt.date(2024, 1, 5), 2.0),
         ("b", dt.date(2024, 2, 1), 3.0)],
        "id string, d date, y double",
    )
    spine = TS.daily_spine(df, "id", "d").collect()
    a_days = sorted(r.ds for r in spine if r.id == "a")
    assert len(a_days) == 5 and a_days[0] == dt.date(2024, 1, 1)
    assert len([r for r in spine if r.id == "b"]) == 1  # clamped, no phantom history


def test_gap_fill_zeros(spark):
    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 1.0), ("a", dt.date(2024, 1, 3), 2.0)],
        "id string, d date, y double",
    )
    out = {r.d: r.y for r in TS.gap_fill(df, "id", "d", "y").collect()}
    assert out[dt.date(2024, 1, 2)] == 0.0
    TS.validate_panel(TS.gap_fill(df, "id", "d", "y"), "id", "d")


def test_dim_date_holidays(spark):
    cal = TS.dim_date(spark, "2024-01-01", "2024-12-31")
    hol = {r.date.isoformat(): r.holiday_name for r in
           cal.filter(F.col("is_holiday") == 1).collect()}
    assert hol["2024-01-01"] == "New Year's Day"  # Monday, no shift
    assert hol["2024-07-04"] == "Independence Day"  # Thursday
    assert hol["2024-11-28"] == "Thanksgiving"  # 4th Thursday
    assert hol["2024-12-25"] == "Christmas Day"
    assert "2024-05-27" in hol  # Memorial Day = last Monday of May
    # 2022 observance shift: Christmas 2022 is a Sunday → observed Mon 26th
    cal22 = TS.dim_date(spark, "2022-12-01", "2022-12-31")
    hol22 = {r.date.isoformat() for r in cal22.filter(F.col("is_holiday") == 1).collect()}
    assert "2022-12-26" in hol22 and "2022-12-25" not in hol22


def test_regrain_preserves_total(spark):
    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, i), float(i)) for i in range(1, 15)],
        "id string, d date, y double",
    )
    weekly = TS.regrain(df, "id", "d", "y", "week")
    total = weekly.agg(F.sum("y")).collect()[0][0]
    assert total == sum(range(1, 15))


def test_zero_frac_prune(spark):
    rows = [("z", dt.date(2024, 1, i), 0.0) for i in range(1, 11)] + [
        ("k", dt.date(2024, 1, i), 1.0) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "id string, d date, y double")
    kept = {r.id for r in TS.zero_fraction_prune(df, "id", "y", 0.5).collect()}
    assert kept == {"k"}


def test_make_series_gap_fill_and_bounds(spark):
    import datetime as dt
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.timeseries import make_series

    rows = [
        ("a", "2024-01-01T00:30:00", 1.0),
        ("a", "2024-01-03T10:00:00", 2.0),
        ("a", "2024-01-03T11:00:00", 3.0),
        ("a", "2023-12-31T23:59:59", 99.0),  # before window -> dropped
        ("a", "2024-01-05T00:00:00", 99.0),  # at stop -> dropped
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = make_series(
        df, ["k"], "ts", "2024-01-01", "2024-01-05", 86400, agg="sum", value_col="v"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["series"] == [1.0, 0.0, 5.0, 0.0]
    assert [b.date() for b in r["bins"]] == [
        dt.date(2024, 1, 1), dt.date(2024, 1, 2), dt.date(2024, 1, 3), dt.date(2024, 1, 4)
    ]


def test_make_series_global_no_keys(spark):
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.timeseries import make_series

    df = spark.createDataFrame(
        [("2024-01-01T01:00:00",), ("2024-01-02T01:00:00",)], "ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = make_series(df, [], "ts", "2024-01-01", "2024-01-04", 86400).collect()
    assert len(out) == 1
    assert out[0]["series"] == [1.0, 1.0, 0.0]


def test_make_series_rejects_bad_agg(spark):
    import pytest
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.timeseries import make_series

    df = spark.createDataFrame([("2024-01-01T01:00:00",)], "ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    with pytest.raises(ValueError):
        make_series(df, [], "ts", "2024-01-01", "2024-01-02", 3600, agg="median")
    with pytest.raises(ValueError):
        make_series(df, [], "ts", "2024-01-01", "2024-01-02", 3600, agg="sum")


def test_series_stats_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.timeseries import series_stats

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([(vals,)], "series array<double>")
    r = series_stats(df, "series").collect()[0]
    assert r["s_min"] == 1.0 and r["s_max"] == 9.0
    assert abs(r["s_avg"] - np.mean(vals)) < 1e-9
    assert abs(r["s_var"] - np.var(vals)) < 1e-9
    assert abs(r["s_stdev"] - np.std(vals)) < 1e-9


def test_linear_trend_exact_line_and_fit_per_group_parity(spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        fit_per_group, forecast_linear, linear_trend,
    )

    # exact line y = 3x + 7 -> recovered exactly; constant -> slope 0
    rows = [("a", x, 3.0 * x + 7.0) for x in range(10)] + [
        ("b", x, 5.0) for x in range(4)
    ]
    df = spark.createDataFrame(rows, "k string, x int, y double")
    t = {r["k"]: r for r in linear_trend(df, ["k"], "x", "y").collect()}
    assert abs(t["a"]["slope"] - 3.0) < 1e-9 and abs(t["a"]["intercept"] - 7.0) < 1e-9
    assert t["b"]["slope"] == 0.0 and abs(t["b"]["intercept"] - 5.0) < 1e-9

    # applyInPandas escape hatch agrees with the closed form
    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sl, ic = np.polyfit(pdf["x"], pdf["y"], 1)
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "slope": [sl], "intercept": [ic]})

    p = {
        r["k"]: r
        for r in fit_per_group(
            df.filter("k = 'a'"), ["k"], fit, "k string, slope double, intercept double"
        ).collect()
    }
    assert abs(p["a"]["slope"] - 3.0) < 1e-6

    # forecast continues the line
    fc = forecast_linear(
        linear_trend(df.filter("k='a'"), ["k"], "x", "y").withColumn(
            "x_next", F.lit(10)
        ),
        horizon=3,
    ).collect()
    assert [(r["x"], round(r["yhat"], 6)) for r in sorted(fc, key=lambda r: r["x"])] == [
        (10, 37.0), (11, 40.0), (12, 43.0)
    ]


def test_interpolate_linear_model(spark):
    from azuredataengineering_deeplearning_spark.operators.timeseries import interpolate_linear

    rows = [
        ("k", 0, 0.0), ("k", 10, None), ("k", 20, None), ("k", 30, 30.0),
        ("k", 40, None),                       # trailing gap -> nearest (30)
        ("j", 5, None), ("j", 6, 8.0),        # leading gap -> nearest (8)
    ]
    df = spark.createDataFrame(rows, "k string, x int, y double")
    got = {(r["k"], r["x"]): r["y"] for r in
           interpolate_linear(df, ["k"], "x", "y").collect()}
    assert got[("k", 10)] == 10.0 and got[("k", 20)] == 20.0
    assert got[("k", 40)] == 30.0
    assert got[("j", 5)] == 8.0
    assert got[("k", 0)] == 0.0 and got[("k", 30)] == 30.0


def test_seasonal_naive_repeats_last_season(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = [("a", base + dt.timedelta(days=i), float(i % 3)) for i in range(9)]
    df = spark.createDataFrame(rows, "uid string, d date, y double")
    out = TS.seasonal_naive_forecast(df, ["uid"], "d", "y", horizon=6, season=3)
    got = {r["d"].date(): r.yhat for r in out.collect()}
    # history is perfectly period-3: forecasts repeat 0,1,2
    for h in range(1, 7):
        d = base + dt.timedelta(days=8 + h)
        assert got[d] == float((8 + h) % 3)


def test_seasonal_naive_gap_yields_null(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    # day 1 missing: forecast step whose lag hits day 1 must be null
    rows = [("a", base + dt.timedelta(days=i), 1.0) for i in (0, 2)]
    df = spark.createDataFrame(rows, "uid string, d date, y double")
    out = TS.seasonal_naive_forecast(df, ["uid"], "d", "y", horizon=2, season=2)
    got = {r["d"].date(): r.yhat for r in out.collect()}
    assert got[base + dt.timedelta(days=3)] is None  # lag → day 1 (gap)
    assert got[base + dt.timedelta(days=4)] == 1.0  # lag → day 2


def test_conformal_intervals_cover_yhat_symmetrically(spark):
    calib = spark.createDataFrame(
        [("a", 10.0, 9.0), ("a", 10.0, 11.0), ("a", 10.0, 10.5)],
        "uid string, y double, yhat double",
    )
    pred = spark.createDataFrame([("a", 12.0, 10.0)], "uid string, y double, yhat double")
    out = TS.conformal_intervals(calib, pred, ["uid"], "y", "yhat", alpha=0.5).collect()
    (r,) = out
    assert r.lo < r.yhat < r.hi
    assert abs((r.yhat - r.lo) - (r.hi - r.yhat)) < 1e-12


def test_conformal_intervals_drop_uncalibrated_keys(spark):
    calib = spark.createDataFrame([("a", 1.0, 1.0)], "uid string, y double, yhat double")
    pred = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 1.0, 1.0)], "uid string, y double, yhat double"
    )
    out = TS.conformal_intervals(calib, pred, ["uid"], "y", "yhat")
    assert [r.uid for r in out.collect()] == ["a"]


def test_ewma_bands_flags_spike_only(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    vals = [10.0, 11.0] * 10 + [10.5] + [100.0]  # mild wiggle then a spike
    rows = [("a", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid string, d date, y double")
    out = {r["d"].day: r for r in
           TS.ewma_bands(df, ["uid"], "d", "y", alpha=0.3, k=3.0, span=30).collect()}
    assert out[22].is_anomaly  # the spike
    assert not any(out[i].is_anomaly for i in range(1, 22))
    # first point has no priors: no band, never anomalous
    assert out[1].ewma is None and out[1].sigma is None


def test_ewma_bands_band_lags_one_step(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = [("a", base + dt.timedelta(days=i), float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "uid string, d date, y double")
    out = sorted(
        TS.ewma_bands(df, ["uid"], "d", "y", span=3).collect(),
        key=lambda r: r["d"],
    )
    # ewma at t uses only prior values, so it trails the ramp
    for r in out[1:]:
        assert r.ewma < r.y


def test_cusum_flags_level_shift_not_stationary(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    # stationary noise then a sustained +shift
    vals = [10.0, 10.5, 9.5, 10.2, 9.8] * 6 + [14.0] * 10
    rows = [("a", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    # a purely stationary control series
    rows += [("b", base + dt.timedelta(days=i), 10.0 + (i % 2) * 0.5)
             for i in range(40)]
    df = spark.createDataFrame(rows, "uid string, d date, y double")
    out = TS.cusum_changepoints(df, ["uid"], "d", "y").collect()
    a_flags = [r for r in out if r.uid == "a" and r.is_change]
    b_flags = [r for r in out if r.uid == "b" and r.is_change]
    assert a_flags, "sustained shift must trigger the CUSUM alarm"
    assert min(r["d"] for r in a_flags) >= base + dt.timedelta(days=30)
    assert not b_flags, "stationary series must not alarm"


def test_cusum_statistics_nonnegative_and_reset(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    vals = [0.0] * 20 + [50.0] * 5 + [0.0] * 10
    rows = [("a", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid string, d date, y double")
    out = sorted(
        TS.cusum_changepoints(df, ["uid"], "d", "y").collect(),
        key=lambda r: r["d"],
    )
    assert all(r.s_hi >= 0 and r.s_lo >= 0 for r in out)
    alarm_idx = [i for i, r in enumerate(out) if r.is_change]
    assert alarm_idx  # the burst alarms
    i = alarm_idx[0]
    # statistic resets after the alarm: next point starts from 0 base
    assert out[i + 1].s_hi <= out[i].s_hi


def test_rolling_corr_tracks_relationship(spark):
    import datetime as dt

    base = dt.date(2024, 1, 1)
    # y = 2*gy exactly -> corr 1; anti-phase key -> corr -1
    rows = []
    for i in range(10):
        rows.append(("pos", base + dt.timedelta(days=i), 2.0 * i, float(i)))
        rows.append(("neg", base + dt.timedelta(days=i), -3.0 * i, float(i)))
    df = spark.createDataFrame(rows, "uid string, d date, y double, gy double")
    out = TS.rolling_corr(df, ["uid"], "d", "y", "gy", window=5).collect()
    last = {r.uid: r.corr for r in out if r["d"] == base + dt.timedelta(days=9)}
    assert abs(last["pos"] - 1.0) < 1e-9
    assert abs(last["neg"] + 1.0) < 1e-9
    first = [r.corr for r in out if r["d"] == base]
    assert all(c is None for c in first)  # single-point windows: null


def test_new_vs_returning_accounting(spark):
    import datetime as dt

    t = lambda w: dt.datetime(2024, 1, 1) + dt.timedelta(weeks=w)
    rows = [("u1", t(0)), ("u1", t(1)), ("u2", t(1)), ("u2", t(1))]
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = {r.period: (r.new_users, r.returning_users) for r in
           TS.new_vs_returning(df, "uid", "ts").collect()}
    periods = sorted(out)
    assert out[periods[0]] == (1, 0)   # u1 new
    assert out[periods[1]] == (1, 1)   # u2 new, u1 returning (dedup'd)


def test_period_growth_deltas(spark):
    import datetime as dt

    t = lambda w: dt.datetime(2024, 1, 1) + dt.timedelta(weeks=w)
    rows = [(t(0), 10.0), (t(1), 15.0), (t(2), 12.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = sorted(TS.period_growth(df, "ts", "v").collect(), key=lambda r: r.period)
    assert out[0].delta is None and out[0].pct_change is None
    assert out[1].delta == 5.0 and abs(out[1].pct_change - 0.5) < 1e-12
    assert out[2].delta == -3.0 and abs(out[2].pct_change + 0.2) < 1e-12


def test_tenure_survival_monotone_and_exact(spark):
    import datetime as dt

    t = lambda w: dt.datetime(2024, 1, 1) + dt.timedelta(weeks=w)
    rows = [("a", t(0)), ("a", t(2)),   # span 3 weeks
            ("b", t(0)),                 # span 1
            ("c", t(1)), ("c", t(1))]    # span 1
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = {r.tenure: r.n_surviving for r in
           TS.tenure_survival(df, "uid", "ts").collect()}
    assert out == {1: 3, 2: 1, 3: 1}
    vals = [out[k] for k in sorted(out)]
    assert vals == sorted(vals, reverse=True)  # monotone non-increasing


def test_interarrival_stats_gaps(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0), ("a", t0 + dt.timedelta(seconds=10)),
            ("a", t0 + dt.timedelta(seconds=40)),
            ("solo", t0)]
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = {r.uid: r for r in TS.interarrival_stats(df, "uid", "ts").collect()}
    assert "solo" not in out  # one event -> no gaps
    a = out["a"]
    assert a.n_gaps == 2 and a.mean_gap_s == 20.0
    assert a.median_gap_s == 20.0 and a.max_gap_s == 30.0


def test_activity_heatmap_cells(spark):
    import datetime as dt

    # Monday 2024-01-01 at hours 9, 9, 17; Sunday 2024-01-07 at 9
    rows = [
        (dt.datetime(2024, 1, 1, 9), 1.0),
        (dt.datetime(2024, 1, 1, 9), 2.0),
        (dt.datetime(2024, 1, 1, 17), 3.0),
        (dt.datetime(2024, 1, 7, 9), 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {(r.dow, r.hour): r for r in TS.activity_heatmap(df, "ts", "v").collect()}
    assert out[(1, 9)].n == 2 and out[(1, 9)].value_sum == 3.0   # ISO Monday
    assert out[(7, 9)].n == 1                                     # ISO Sunday
    assert abs(out[(1, 17)].share - 0.25) < 1e-12


def test_grouped_apply_packed_contract(spark):
    """Packed grouped apply ≡ groupBy().applyInPandas on the same fn:
    same groups (incl. a NULL key), same multi-row outputs — and the
    fan-out stays pinned at defaultParallelism (AQE byte-coalescing
    would otherwise fold a small panel into ONE task and serialize
    every CPU-bound group through one python worker)."""
    import pandas as pd

    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        grouped_apply_packed,
    )

    rows = [
        (None, 1, 1.0), (None, 2, 2.0),
        ("a", 1, 3.0), ("a", 2, 4.0), ("a", 3, 5.0),
        ("b", 1, 6.0),
    ]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    schema = "k string, o int, cum double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # multi-row output: per-group running sum in o order
        pdf = pdf.sort_values("o", kind="mergesort").reset_index(drop=True)
        out = pdf[["k", "o"]].copy()
        out["cum"] = pdf["v"].cumsum()
        return out

    packed = {(r.k, r.o, r.cum) for r in
              grouped_apply_packed(df, ["k"], fn, schema).collect()}
    native = {(r.k, r.o, r.cum) for r in
              df.groupBy("k").applyInPandas(fn, schema).collect()}
    assert packed == native
    assert (None, 2, 3.0) in packed  # null-key group survives
    # pinned fan-out: partitions = defaultParallelism, not AQE-coalesced
    n = grouped_apply_packed(df, ["k"], fn, schema).rdd.getNumPartitions()
    assert n == spark.sparkContext.defaultParallelism
    # r14 width dial: a caller that knows its group count can shrink
    # the exchange (3 groups -> 3 partitions) with identical results
    sized = grouped_apply_packed(df, ["k"], fn, schema, num_partitions=3)
    assert sized.rdd.getNumPartitions() == 3
    assert {(r.k, r.o, r.cum) for r in sized.collect()} == native


@pytest.mark.slow
def test_rolling_active_users_and_engagement(spark):
    import datetime as dt

    rows = []
    # u1 active days 1,2; u2 active day 2; u3 active day 5
    for u, d in [(1, 1), (1, 1), (1, 2), (2, 2), (3, 5)]:
        rows.append((u, dt.datetime(2024, 1, d, 12)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        engagement_ratio,
        rolling_active_users,
    )

    got = {
        str(r["day"]): r["active_3d"]
        for r in rolling_active_users(df, "ts", "user_id", 3).collect()
    }
    # only OBSERVED days emitted; day2 window covers days -1..2 -> u1,u2
    assert got == {"2024-01-01": 1, "2024-01-02": 2, "2024-01-05": 1}

    er = {
        str(r["day"]): (r["active_1d"], r["active_3d"], r["engagement"])
        for r in engagement_ratio(df, "ts", "user_id", 1, 3).collect()
    }
    assert er["2024-01-02"] == (2, 2, 1.0)
    assert er["2024-01-05"] == (1, 1, 1.0)
