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


pytestmark = pytest.mark.slow  # heavy differential/fuzz suite: deselected by default (pytest.ini), run with -m ""


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


# ---------------------------------------------------------------------
# round-13 series-library additions: seasonal (median), fit_2lines,
# fit_poly, directional fills, vector ops — same twin discipline
# ---------------------------------------------------------------------


def _seasonal_twin(y, period):
    n = len(y)
    p = _period_of(y, period)
    if p <= 0:
        return [0.0] * n
    meds = []
    for r in range(p):
        c = sorted(y[j] for j in range(n) if j % p == r)
        if len(c) % 2 == 1:
            meds.append(c[len(c) // 2])
        else:
            meds.append((c[len(c) // 2 - 1] + c[len(c) // 2]) / 2)
    return [meds[i % p] for i in range(n)]


def _fit2_twin(y):
    """Bit-exact replay of series_fit_2lines_dynamic_sql: the same
    prefix arrays, segment closed forms and RSS identity in the same
    arithmetic order, so the argmin (the discrete output) agrees."""
    n = len(y)
    if n < 4:
        return None
    ps, pj, pq = [], [], []
    for i, v in enumerate(y):
        ps.append((0.0 if i == 0 else ps[i - 1]) + v)
        pj.append((0.0 if i == 0 else pj[i - 1]) + float(i) * v)
        pq.append((0.0 if i == 0 else pq[i - 1]) + v * v)

    def seg(m, sy, sxy):
        sx = m * (m - 1) / 2
        sxx = m * (m - 1) * (2 * m - 1) / 6
        den = m * sxx - sx * sx
        sl = (m * sxy - sx * sy) / den if den > 0 else 0.0
        return sl, sx, sxx

    def rss(m, sy, sxy, syy, sl, sx, sxx, b):
        return (syy + m * b * b + sl * sl * sxx + 2 * b * sl * sx
                - 2 * b * sy - 2 * sl * sxy)

    best_r, best_k = float("inf"), 0
    for k in range(2, n - 1):
        lm = float(k)
        lsy, lsxy, lsyy = ps[k - 1], pj[k - 1], pq[k - 1]
        lsl, lsx, lsxx = seg(lm, lsy, lsxy)
        lb = (lsy - lsl * lsx) / lm
        rm = float(n - k)
        rsy = ps[n - 1] - ps[k - 1]
        rsxy = (pj[n - 1] - pj[k - 1]) - float(k) * (ps[n - 1] - ps[k - 1])
        rsyy = pq[n - 1] - pq[k - 1]
        rsl, rsx, rsxx = seg(rm, rsy, rsxy)
        rb = (rsy - rsl * rsx) / rm
        tot = (rss(lm, lsy, lsxy, lsyy, lsl, lsx, lsxx, lb)
               + rss(rm, rsy, rsxy, rsyy, rsl, rsx, rsxx, rb))
        if tot < best_r:
            best_r, best_k = tot, k
    k = best_k
    lsl, lsx, _ = seg(float(k), ps[k - 1], pj[k - 1])
    lb = (ps[k - 1] - lsl * lsx) / float(k)
    rm = float(n - k)
    rsy = ps[n - 1] - ps[k - 1]
    rsxy = (pj[n - 1] - pj[k - 1]) - float(k) * (ps[n - 1] - ps[k - 1])
    rsl, rsx, _ = seg(rm, rsy, rsxy)
    rb = (rsy - rsl * rsx) / rm
    va = max(pq[n - 1] / n - (ps[n - 1] / n) * (ps[n - 1] / n), 0.0)
    rsq = max(0.0, 1 - (best_r / n) / va) if va > 0 else 1.0
    fit = [lb + lsl * float(i) if i < k else rb + rsl * float(i - k)
           for i in range(n)]
    return {"split_idx": k, "rsquare": rsq, "variance": va,
            "rvariance": max(best_r / n, 0.0), "line_fit": fit,
            "left_slope": lsl, "left_interception": lb,
            "right_slope": rsl, "right_interception": rb}


def _poly2_twin(y):
    n = float(len(y))
    if len(y) < 3:
        return None
    s1 = (n - 1) * n / 2
    s2 = (n - 1) * n * (2 * n - 1) / 6
    s3 = s1 * s1
    s4 = (n - 1) * n * (2 * n - 1) * (3 * ((n - 1) * (n - 1))
                                      + 3 * (n - 1) - 1) / 30
    t0 = _fsum(y)
    t1 = 0.0
    for i, v in enumerate(y):
        t1 = t1 + float(i) * v
    t2 = 0.0
    for i, v in enumerate(y):
        t2 = t2 + float(i) * float(i) * v

    def det3(a, b, c, d, e, f, g, h, i):
        return (a * (e * i - f * h) - b * (d * i - f * g)
                + c * (d * h - e * g))

    dm = det3(n, s1, s2, s1, s2, s3, s2, s3, s4)
    d0 = det3(t0, s1, s2, t1, s2, s3, t2, s3, s4)
    d1 = det3(n, t0, s2, s1, t1, s3, s2, t2, s4)
    d2 = det3(n, s1, t0, s1, s2, t1, s2, s3, t2)
    c0, c1, c2 = d0 / dm, d1 / dm, d2 / dm
    return [c2, c1, c0]


def _fill_twin(y, forward):
    out = []
    for i, v in enumerate(y):
        if v is not None:
            out.append(v)
            continue
        src = None
        rng_ = range(0, i + 1) if forward else range(i, len(y))
        for j in (rng_ if forward else rng_):
            if y[j] is not None:
                src = y[j]
                if not forward:
                    break
        out.append(src)
    return out


def test_fuzz_series_seasonal(spark, duck):
    rng = random.Random(1308)
    for ci in range(6):
        n = rng.choice([6, 10, 14, 21, 30])
        series = [
            (rid, _mk_series(rng, n, rng.choice(["sine", "trend_sine",
                                                 "random", "const"])))
            for rid in range(3)
        ]
        period = rng.choice([-1, 2, 3, rng.randint(2, max(2, n // 2))])
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            f"T | extend s = series_seasonal(y, {period})"
            " | project rid, s",
        ).selectExpr("rid", "posexplode(s) AS (ix, v)").selectExpr(
            "rid", "cast(ix as int) as ix", "v"
        )
        rows = []
        for rid, ys in series:
            sv = _seasonal_twin(ys, period)
            rows.extend((rid, i, sv[i]) for i in range(len(ys)))
        _register(duck, f"exp_sea_{ci}",
                  pd.DataFrame(rows, columns=["rid", "ix", "v"]))
        _match(out, duck, f"exp_sea_{ci}",
               f"seasonal ci={ci} n={n} period={period}")


def test_fuzz_series_fit_2lines(spark, duck):
    rng = random.Random(1309)
    for ci in range(6):
        n = rng.choice([4, 5, 8, 12, 20, 31])
        # knee shapes AND pure noise (near-tie stress for the argmin)
        series = []
        for rid in range(3):
            kind = rng.choice(["knee", "random", "trend_sine"])
            if kind == "knee":
                k = rng.randint(2, n - 2)
                s1, s2 = rng.uniform(-2, 2), rng.uniform(-2, 2)
                series.append((rid, [
                    round(s1 * i + rng.uniform(-0.2, 0.2), 3) if i < k
                    else round(s1 * k + s2 * (i - k)
                               + rng.uniform(-0.2, 0.2), 3)
                    for i in range(n)
                ]))
            else:
                series.append((rid, _mk_series(rng, n, kind)))
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            "T | extend f = series_fit_2lines_dynamic(y)"
            " | project rid, f",
        ).selectExpr(
            "rid", "f.split_idx as k", "f.rsquare as rsq",
            "f.rvariance as rv", "f.variance as va",
            "f.left_slope as ls", "f.left_interception as lb",
            "f.right_slope as rs", "f.right_interception as rb",
        )
        rows = []
        for rid, ys in series:
            f = _fit2_twin(ys)
            rows.append((rid, f["split_idx"], f["rsquare"],
                         f["rvariance"], f["variance"], f["left_slope"],
                         f["left_interception"], f["right_slope"],
                         f["right_interception"]))
        pdf = pd.DataFrame(rows, columns=["rid", "k", "rsq", "rv", "va",
                                          "ls", "lb", "rs", "rb"])
        pdf["k"] = pdf["k"].astype("int32")
        _register(duck, f"exp_f2_{ci}", pdf)
        _match(out, duck, f"exp_f2_{ci}", f"fit_2lines ci={ci} n={n}")


def test_fuzz_series_fit_poly2(spark, duck):
    rng = random.Random(1310)
    for ci in range(4):
        n = rng.choice([3, 5, 9, 16, 31])
        series = [
            (rid, _mk_series(rng, n, rng.choice(["random", "trend_sine",
                                                 "sine"])))
            for rid in range(3)
        ]
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            "T | extend f = series_fit_poly(y, 2) | project rid, f",
        ).selectExpr(
            "rid", "f.coefficients[0] as c2", "f.coefficients[1] as c1",
            "f.coefficients[2] as c0",
        )
        rows = []
        for rid, ys in series:
            c2, c1, c0 = _poly2_twin(ys)
            rows.append((rid, c2, c1, c0))
        _register(duck, f"exp_p2_{ci}",
                  pd.DataFrame(rows, columns=["rid", "c2", "c1", "c0"]))
        _match(out, duck, f"exp_p2_{ci}", f"fit_poly2 ci={ci} n={n}")


def test_fuzz_series_fills(spark, duck):
    rng = random.Random(1311)
    for ci in range(4):
        n = rng.choice([4, 8, 15, 24])
        series = []
        for rid in range(3):
            ys = [None if rng.random() < 0.4
                  else round(rng.uniform(-9, 9), 3) for _ in range(n)]
            series.append((rid, ys))
        sdf = spark.createDataFrame(series, "rid int, y array<double>")
        out = kql_to_df(
            {"T": sdf},
            "T | extend f = series_fill_forward(y),"
            " b = series_fill_backward(y) | project rid, f, b",
        ).selectExpr(
            "rid", "posexplode(arrays_zip(f, b)) AS (ix, z)"
        ).selectExpr("rid", "cast(ix as int) as ix", "z.f as f", "z.b as b")
        rows = []
        for rid, ys in series:
            ff = _fill_twin(ys, True)
            fb = _fill_twin(ys, False)
            rows.extend((rid, i, ff[i], fb[i]) for i in range(len(ys)))
        _register(duck, f"exp_fl_{ci}",
                  pd.DataFrame(rows, columns=["rid", "ix", "f", "b"]))
        _match(out, duck, f"exp_fl_{ci}", f"fills ci={ci} n={n}")


def test_fuzz_series_vector_ops(spark, duck):
    # round-13: the kernel is a sequential IEEE-754 double left fold
    # (index order) — replicate the exact op sequence: acc + a[i]*b[i]
    def dot_dec(a, b):
        acc = 0.0
        for i in range(min(len(a), len(b))):
            acc = acc + a[i] * b[i]
        return acc

    rng = random.Random(1312)
    for ci in range(4):
        na, nb = rng.choice([(5, 5), (8, 6), (12, 12), (3, 9)])
        series = [
            (rid,
             [round(rng.uniform(-9, 9), 3) for _ in range(na)],
             [round(rng.uniform(-9, 9), 3) for _ in range(nb)])
            for rid in range(3)
        ]
        sdf = spark.createDataFrame(
            series, "rid int, a array<double>, b array<double>"
        )
        out = kql_to_df(
            {"T": sdf},
            "T | extend d = series_dot_product(a, b),"
            " m = series_magnitude(a),"
            " c = series_cosine_similarity(a, b)"
            " | project rid, d, m, c",
        )
        rows = []
        for rid, a, b in series:
            d = dot_dec(a, b)
            m = math.sqrt(dot_dec(a, a))
            # cosine's norms run over the SHORTER prefix (the engine's
            # least-length convention inside the kernel)
            k = min(len(a), len(b))
            c = d / (math.sqrt(dot_dec(a[:k], a[:k]))
                     * math.sqrt(dot_dec(b[:k], b[:k])))
            rows.append((rid, d, m, c))
        _register(duck, f"exp_vo_{ci}",
                  pd.DataFrame(rows, columns=["rid", "d", "m", "c"]))
        _match(out, duck, f"exp_vo_{ci}",
               f"vector_ops ci={ci} na={na} nb={nb}")
