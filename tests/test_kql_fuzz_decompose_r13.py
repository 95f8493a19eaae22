"""Round-13 fuzzer extension (verdict r12 ask #1): the series_decompose
family — series_decompose / _forecast / _anomalies /
series_periods_detect / series_periods_validate
(operators/timeseries.py) — gets seeded-random generated cases
asserted against FOREIGN Python/numpy twins, compared through DuckDB
with the sweep's frame_hash (same discipline as the r12 iir
companion-matrix twin: the twin re-derives every component with a
different implementation — explicit Python loops in the engine's fold
order, so IEEE sums are bit-identical — and the expected arrays are
registered as a DuckDB table the hash comparison reads).

Replayed semantics (the documented dialect, PARITY.md):

- trend: 'linefit' = the closed-form least-squares line (slope via
  n·Σxy − Σx·Σy over n·Σx² − (Σx)², Σx/Σx² closed forms), 'avg' =
  constant mean, 'none' = zeros;
- seasonal: per-period-class MEANS of the detrended series, the class
  count via the (n−1−r) div p + 1 closed form with Spark's
  truncate-toward-zero DIV (exercised by period > n cases where
  Python // floors differently);
- period −1 autodetection: top normalized-ACF lag in [2, n/2] (strict
  > keeps the smallest tied lag), gated at score ≥ 0.6, constant
  series (va = 0 → try_divide null → −2) detect nothing — the
  generators dial signal/noise so BOTH gate outcomes occur (asserted);
- forecast: model fit on the training prefix only (period
  autodetection included — no peeking), emitted over the full length;
  points ≥ length → null (pinned);
- anomalies: Tukey fences at k·IQR beyond linear-interpolated
  residual quartiles; period = 0 + linefit takes the dedicated
  fit-line baseline branch (replayed as that exact branch, not the
  equivalent decompose, so a −0.0 drift in the zip would be caught);
- periods_detect: clipped ACF over [max(2,min_p), (max_p≤0 ? n div 2
  : min(max_p, n−1))], score > 0 only, ranked (−score, lag) with an
  array_sort struct key, top k; periods_validate scores GIVEN lags in
  input order with out-of-range → 0.

Randomized per the verdict ask: period ∈ {−1, 0, 1, 2..n/2, > n},
bin counts 4..48, gate-boundary ACF signals, forecast split points
(0, interior, ≥ n), trend ∈ {linefit, avg, none}, k thresholds.
"""

import math
import random

import pandas as pd
import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from check_correctness import frame_hash  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    import duckdb

    return duckdb.connect()


def _match(got_df, duck, name, label):
    got = frame_hash(got_df.toPandas())
    want = frame_hash(duck.sql(f"SELECT * FROM {name}").df())
    assert got[0] > 0, f"VACUOUS CASE [{label}]"
    assert got == want, f"TWIN MISMATCH [{label}]"


# ---------------------------------------------------------------------
# foreign twin: explicit Python loops in the engine's fold order
# ---------------------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    """Spark's integral DIV truncates toward zero; Python // floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _fsum(vals):
    acc = 0.0
    for v in vals:
        acc = acc + v
    return acc


def _fit_line(y):
    """(interception, slope) replaying series_fit_line_sql's closed
    forms in its evaluation order."""
    n = float(len(y))
    sy = _fsum(y)
    sxy = 0.0
    for i, v in enumerate(y):
        sxy = sxy + float(i) * v
    sx = n * (n - 1) / 2
    sxx = n * (n - 1) * (2 * n - 1) / 6
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    b = (sy - slope * (n * (n - 1) / 2)) / n
    return b, slope


def _acf_best(y):
    """(best_score, best_lag) replaying _acf_best_expr: lags 2..n div 2,
    strict > keeps the smallest tied lag, va = 0 → −2 scores."""
    n = len(y)
    if n < 4:
        return -2.0, 0
    mu = _fsum(y) / n
    va = 0.0
    for v in y:
        va = va + (v - mu) * (v - mu)
    best_s, best_l = -2.0, 0
    for lag in range(2, _tdiv(n, 2) + 1):
        num = 0.0
        for i in range(0, n - lag):
            num = num + (y[i] - mu) * (y[i + lag] - mu)
        score = -2.0 if va == 0.0 else num / va
        if score > best_s:
            best_s, best_l = score, lag
    return best_s, best_l


def _period_of(y, period: int) -> int:
    if period == -1:
        s, lag = _acf_best(y)
        return lag if s >= 0.6 else 0
    return period


def _class_means(d, p: int):
    out = []
    for r in range(p):
        acc = 0.0
        for j in range(len(d)):
            acc = acc + (d[j] if j % p == r else 0.0)
        out.append(acc / float(_tdiv(len(d) - 1 - r, p) + 1))
    return out


def _trend_arr(src, trend: str, out_n: int):
    """Trend fit on `src`, emitted over out_n positions (decompose:
    src is the full series; forecast: src is the training prefix)."""
    if trend == "linefit":
        b, sl = _fit_line(src)
        return [b + sl * float(i) for i in range(out_n)]
    if trend == "avg":
        mu = _fsum(src) / len(src)
        return [mu] * out_n
    return [0.0] * out_n


def _decompose(y, period: int, trend: str):
    n = len(y)
    t = _trend_arr(y, trend, n)
    d = [y[i] - t[i] for i in range(n)]
    p = _period_of(y, period)
    if p > 0:
        cm = _class_means(d, p)
        s = [cm[i % p] for i in range(n)]
    else:
        s = [0.0] * n
    b = [t[i] + s[i] for i in range(n)]
    r = [y[i] - b[i] for i in range(n)]
    return b, s, t, r, p


def _forecast(y, points: int, period: int, trend: str):
    n = len(y)
    m = max(n - points, 0)
    if m <= 0:
        return None, 0
    yt = y[:m]
    t = _trend_arr(yt, trend, n)
    d = [yt[i] - t[i] for i in range(m)]
    p = _period_of(yt, period)
    if p > 0:
        cm = _class_means(d, p)
        s = [cm[i % p] for i in range(n)]
    else:
        s = [0.0] * n
    return [t[i] + s[i] for i in range(n)], p


def _quantile(srt, frac: float):
    """Linear-interpolated quantile of a SORTED list, replaying the
    engine's pos = (n−1)p / lo = floor / clamped hi formula."""
    pos = float(len(srt) - 1) * frac
    lo = math.floor(pos)
    hi = min(lo + 1, len(srt) - 1)
    return srt[lo] * (1 - (pos - lo)) + srt[hi] * (pos - lo)


def _anomalies(y, k: float, period: int, trend: str):
    n = len(y)
    if period == 0 and trend == "linefit":
        b, sl = _fit_line(y)
        bl = [b + sl * float(i) for i in range(n)]
    else:
        bl = _decompose(y, period, trend)[0]
    r = [y[i] - bl[i] for i in range(n)]
    srt = sorted(r)
    q1, q3 = _quantile(srt, 0.25), _quantile(srt, 0.75)
    iqr = q3 - q1
    an = [
        1 if v > q3 + k * iqr else (-1 if v < q1 - k * iqr else 0)
        for v in r
    ]
    sc = [v / iqr if iqr > 0 else 0.0 for v in r]
    return an, sc, bl


def _periods_detect(y, min_p: int, max_p: int, k: int):
    n = len(y)
    mu = _fsum(y) / n
    va = 0.0
    for v in y:
        va = va + (v - mu) * (v - mu)
    hi = _tdiv(n, 2) if max_p <= 0 else min(max_p, n - 1)
    lo = max(2, min_p)
    entries = []
    for lag in range(lo, hi + 1) if hi >= lo else []:
        num = 0.0
        for i in range(0, n - lag):
            num = num + (y[i] - mu) * (y[i + lag] - mu)
        sc = 0.0 if va == 0.0 else max(num / va, 0.0)
        entries.append((-sc, lag))
    entries.sort()
    top = [e for e in entries if e[0] < 0][:k]
    return [float(l) for _, l in top], [-negs for negs, _ in top]


def _periods_validate(y, periods):
    n = len(y)
    mu = _fsum(y) / n
    va = 0.0
    for v in y:
        va = va + (v - mu) * (v - mu)
    scores = []
    for lag in periods:
        if lag < 1 or lag > n - 1:
            scores.append(0.0)
            continue
        num = 0.0
        for i in range(0, n - lag):
            num = num + (y[i] - mu) * (y[i + lag] - mu)
        scores.append(0.0 if va == 0.0 else max(num / va, 0.0))
    return [float(p) for p in periods], scores


# ---------------------------------------------------------------------
# generators: signal shapes that straddle the 0.6 autodetect gate
# ---------------------------------------------------------------------


def _mk_series(rng, n: int, kind: str):
    if kind == "sine":
        p = rng.choice([3, 4, 5, 6, 7])
        amp = rng.uniform(2, 8)
        return [
            round(amp * math.sin(2 * math.pi * i / p)
                  + rng.uniform(-0.2, 0.2), 3)
            for i in range(n)
        ]
    if kind == "noisy_sine":
        p = rng.choice([4, 5, 6])
        amp = rng.uniform(1, 2)
        return [
            round(amp * math.sin(2 * math.pi * i / p)
                  + rng.uniform(-2.5 * amp, 2.5 * amp), 3)
            for i in range(n)
        ]
    if kind == "trend_sine":
        p = rng.choice([4, 6])
        sl = rng.uniform(-0.5, 0.5)
        return [
            round(sl * i + 3 * math.sin(2 * math.pi * i / p)
                  + rng.uniform(-0.3, 0.3), 3)
            for i in range(n)
        ]
    if kind == "const":
        v = round(rng.uniform(-5, 5), 3)
        return [v] * n
    return [round(rng.uniform(-10, 10), 3) for _ in range(n)]


_KINDS = ["sine", "noisy_sine", "trend_sine", "random", "const"]


def _register(duck, name, pdf):
    duck.register(name, pdf)


# ---------------------------------------------------------------------
# series_decompose — 12 twinned cases
# ---------------------------------------------------------------------


def test_fuzz_series_decompose(spark, duck):
    rng = random.Random(1301)
    auto_hits = {"pos": 0, "zero": 0}
    for ci in range(12):
        n = rng.choice([4, 5, 8, 12, 16, 24, 36, 48])
        series = [
            (rid, _mk_series(rng, n, rng.choice(_KINDS)))
            for rid in range(3)
        ]
        period = rng.choice([-1, -1, 0, 1, rng.randint(2, max(2, n // 2)),
                             n + 3])
        trend = rng.choice(["linefit", "avg", "none"])
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            f"T | extend d = series_decompose(y, {period}, '{trend}')"
            " | project rid, d",
        ).selectExpr(
            "rid",
            "posexplode(arrays_zip(d.baseline, d.seasonal, d.trend,"
            " d.residual)) AS (ix, z)",
        ).selectExpr(
            "rid", "cast(ix as int) as ix", "z.baseline as bl",
            "z.seasonal as se", "z.trend as tr", "z.residual as re",
        )
        rows = []
        for rid, ys in series:
            b, s, t, r, p = _decompose(ys, period, trend)
            if period == -1:
                auto_hits["pos" if p > 0 else "zero"] += 1
            rows.extend(
                (rid, i, b[i], s[i], t[i], r[i]) for i in range(len(ys))
            )
        _register(
            duck, f"exp_dec_{ci}",
            pd.DataFrame(rows, columns=["rid", "ix", "bl", "se", "tr",
                                        "re"]),
        )
        _match(out, duck, f"exp_dec_{ci}",
               f"decompose ci={ci} n={n} period={period} trend={trend}")
    # the generators must exercise BOTH sides of the 0.6 gate
    assert auto_hits["pos"] > 0 and auto_hits["zero"] > 0, auto_hits


# ---------------------------------------------------------------------
# series_decompose_forecast — 9 twinned cases + the null pin
# ---------------------------------------------------------------------


def test_fuzz_series_decompose_forecast(spark, duck):
    rng = random.Random(1302)
    auto_hits = {"pos": 0, "zero": 0}
    for ci in range(9):
        n = rng.choice([6, 10, 14, 20, 30, 40])
        series = [
            (rid, _mk_series(rng, n,
                             rng.choice(["sine", "noisy_sine",
                                         "trend_sine", "random"])))
            for rid in range(3)
        ]
        points = rng.choice([0, 1, rng.randint(2, n - 4), n - 4])
        period = rng.choice([-1, -1, 0, rng.randint(2, max(2, n // 3))])
        trend = rng.choice(["linefit", "avg", "none"])
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            f"T | extend f = series_decompose_forecast(y, {points},"
            f" {period}, '{trend}') | project rid, f",
        ).selectExpr("rid", "posexplode(f) AS (ix, v)").selectExpr(
            "rid", "cast(ix as int) as ix", "v"
        )
        rows = []
        for rid, ys in series:
            f, p = _forecast(ys, points, period, trend)
            if period == -1:
                auto_hits["pos" if p > 0 else "zero"] += 1
            rows.extend((rid, i, f[i]) for i in range(len(ys)))
        _register(
            duck, f"exp_fc_{ci}",
            pd.DataFrame(rows, columns=["rid", "ix", "v"]),
        )
        _match(out, duck, f"exp_fc_{ci}",
               f"forecast ci={ci} n={n} points={points} period={period}"
               f" trend={trend}")
    assert auto_hits["pos"] > 0 and auto_hits["zero"] > 0, auto_hits


def test_forecast_points_at_or_past_length_is_null(spark):
    sdf = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "rid int, y array<double>"
    )
    for pts in (4, 9):
        row = kql_to_df(
            {"T": sdf},
            f"T | extend f = series_decompose_forecast(y, {pts})"
            " | project rid, f",
        ).collect()[0]
        assert row["f"] is None


# ---------------------------------------------------------------------
# series_decompose_anomalies — 8 twinned cases
# ---------------------------------------------------------------------


def test_fuzz_series_decompose_anomalies(spark, duck):
    rng = random.Random(1303)
    for ci in range(8):
        n = rng.choice([8, 12, 16, 24, 36])
        series = [
            (rid, _mk_series(rng, n,
                             rng.choice(["sine", "noisy_sine",
                                         "trend_sine", "random",
                                         "const"])))
            for rid in range(3)
        ]
        # binary-exact thresholds so the SQL decimal literal and the
        # Python float are the same double
        k = rng.choice(["0.5", "0.75", "1.5", "2.0", "3.0"])
        period = rng.choice([-1, 0, 0, rng.randint(2, max(2, n // 2))])
        trend = rng.choice(["linefit", "linefit", "avg", "none"])
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            f"T | extend d = series_decompose_anomalies(y, {k},"
            f" {period}, '{trend}') | project rid, d",
        ).selectExpr(
            "rid",
            "posexplode(arrays_zip(d.anomalies, d.score, d.baseline))"
            " AS (ix, z)",
        ).selectExpr(
            "rid", "cast(ix as int) as ix",
            "cast(z.anomalies as int) as an", "z.score as sc",
            "z.baseline as bl",
        )
        rows = []
        for rid, ys in series:
            an, sc, bl = _anomalies(ys, float(k), period, trend)
            rows.extend(
                (rid, i, an[i], sc[i], bl[i]) for i in range(len(ys))
            )
        pdf = pd.DataFrame(rows, columns=["rid", "ix", "an", "sc", "bl"])
        pdf["an"] = pdf["an"].astype("int32")
        _register(duck, f"exp_an_{ci}", pdf)
        _match(out, duck, f"exp_an_{ci}",
               f"anomalies ci={ci} n={n} k={k} period={period}"
               f" trend={trend}")


# ---------------------------------------------------------------------
# series_periods_detect / _validate — 6 + 4 twinned cases
# ---------------------------------------------------------------------


def test_fuzz_series_periods_detect(spark, duck):
    rng = random.Random(1304)
    for ci in range(6):
        n = rng.choice([8, 12, 16, 24, 36, 48])
        # at least one strongly periodic rid per case so the result is
        # never vacuously empty
        series = [(0, _mk_series(rng, n, "sine"))] + [
            (rid, _mk_series(rng, n,
                             rng.choice(["sine", "noisy_sine", "random",
                                         "const"])))
            for rid in range(1, 3)
        ]
        min_p = rng.choice([1, 2, 3, 5])
        max_p = rng.choice([0, 0, rng.randint(3, n), n + 5])
        k = rng.choice([1, 2, 3])
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            f"T | extend d = series_periods_detect(y, {min_p}, {max_p},"
            f" {k}) | project rid, d",
        ).selectExpr(
            "rid",
            "posexplode(arrays_zip(d.periods, d.scores)) AS (ix, z)",
        ).selectExpr(
            "rid", "cast(ix as int) as ix", "z.periods as p",
            "z.scores as s",
        )
        rows = []
        for rid, ys in series:
            ps, scs = _periods_detect(ys, min_p, max_p, k)
            rows.extend(
                (rid, i, ps[i], scs[i]) for i in range(len(ps))
            )
        _register(
            duck, f"exp_pd_{ci}",
            pd.DataFrame(rows, columns=["rid", "ix", "p", "s"]),
        )
        _match(out, duck, f"exp_pd_{ci}",
               f"periods_detect ci={ci} n={n} min={min_p} max={max_p}"
               f" k={k}")


def test_periods_detect_empty_lag_range(spark):
    # lo > hi -> empty candidate set -> empty arrays, not an error
    sdf = spark.createDataFrame(
        [(1, [1.0, 5.0, 2.0, 4.0])], "rid int, y array<double>"
    )
    row = kql_to_df(
        {"T": sdf},
        "T | extend d = series_periods_detect(y, 5, 3, 2)"
        " | project rid, d",
    ).collect()[0]
    assert row["d"]["periods"] == [] and row["d"]["scores"] == []


def test_fuzz_series_periods_validate(spark, duck):
    rng = random.Random(1305)
    for ci in range(4):
        n = rng.choice([8, 16, 24, 36])
        series = [
            (rid, _mk_series(rng, n,
                             rng.choice(["sine", "trend_sine", "random",
                                         "const"])))
            for rid in range(3)
        ]
        # candidate lists include in-range, 0/negative and > n-1 lags
        cands = rng.sample(
            [0, 1, 2, 3, 4, 5, 7, n - 1, n, n + 4, -2], k=rng.choice([2, 3, 4])
        )
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        args = ", ".join(str(c) for c in cands)
        out = kql_to_df(
            {"T": sdf},
            f"T | extend d = series_periods_validate(y, {args})"
            " | project rid, d",
        ).selectExpr(
            "rid",
            "posexplode(arrays_zip(d.periods, d.scores)) AS (ix, z)",
        ).selectExpr(
            "rid", "cast(ix as int) as ix", "z.periods as p",
            "z.scores as s",
        )
        rows = []
        for rid, ys in series:
            ps, scs = _periods_validate(ys, cands)
            rows.extend(
                (rid, i, ps[i], scs[i]) for i in range(len(ps))
            )
        _register(
            duck, f"exp_pv_{ci}",
            pd.DataFrame(rows, columns=["rid", "ix", "p", "s"]),
        )
        _match(out, duck, f"exp_pv_{ci}",
               f"periods_validate ci={ci} n={n} cands={cands}")


# ---------------------------------------------------------------------
# deterministic hard edges the random draw may miss
# ---------------------------------------------------------------------


def test_decompose_edge_periods_twinned(spark, duck):
    rng = random.Random(1306)
    ys = _mk_series(rng, 12, "trend_sine")
    series = [(0, ys)]
    sdf = spark.createDataFrame(series, "rid int, y array<double>")
    # period = n (every class a singleton -> seasonal == detrended,
    # residual == 0) and period = 1 (one class -> constant seasonal)
    for ci, period in enumerate([len(ys), 1]):
        out = kql_to_df(
            {"T": sdf},
            f"T | extend d = series_decompose(y, {period}, 'linefit')"
            " | project rid, d",
        ).selectExpr(
            "rid",
            "posexplode(arrays_zip(d.baseline, d.seasonal, d.trend,"
            " d.residual)) AS (ix, z)",
        ).selectExpr(
            "rid", "cast(ix as int) as ix", "z.baseline as bl",
            "z.seasonal as se", "z.trend as tr", "z.residual as re",
        )
        b, s, t, r, _ = _decompose(ys, period, "linefit")
        _register(
            duck, f"exp_edge_{ci}",
            pd.DataFrame(
                [(0, i, b[i], s[i], t[i], r[i]) for i in range(len(ys))],
                columns=["rid", "ix", "bl", "se", "tr", "re"],
            ),
        )
        _match(out, duck, f"exp_edge_{ci}", f"edge period={period}")


def test_forecast_one_point_training_prefix_twinned(spark, duck):
    # points = n-1 -> the model fits on a SINGLE training point:
    # linefit degenerates to slope 0 / interception y[0], avg to y[0],
    # autodetect (n < 4) to no seasonality
    rng = random.Random(1307)
    ys = _mk_series(rng, 8, "random")
    sdf = spark.createDataFrame([(0, ys)], "rid int, y array<double>")
    for ci, trend in enumerate(["linefit", "avg"]):
        out = kql_to_df(
            {"T": sdf},
            f"T | extend f = series_decompose_forecast(y, {len(ys) - 1},"
            f" -1, '{trend}') | project rid, f",
        ).selectExpr("rid", "posexplode(f) AS (ix, v)").selectExpr(
            "rid", "cast(ix as int) as ix", "v"
        )
        f, _ = _forecast(ys, len(ys) - 1, -1, trend)
        _register(
            duck, f"exp_fc1_{ci}",
            pd.DataFrame(
                [(0, i, f[i]) for i in range(len(ys))],
                columns=["rid", "ix", "v"],
            ),
        )
        _match(out, duck, f"exp_fc1_{ci}", f"forecast-1pt trend={trend}")
