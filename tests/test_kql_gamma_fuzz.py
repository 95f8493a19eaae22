"""Round-13 gamma family — differential check of the engine's Lanczos
g=7 expression against TWO foreign implementations: DuckDB's native
gamma/lgamma and libm via Python's math module. Tolerance compare
(relative 1e-11), not hash compare: three independent algorithms agree
to ~1e-13 but not bit-for-bit."""

import math
import random

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


pytestmark = pytest.mark.slow  # heavy differential/fuzz suite: deselected by default (pytest.ini), run with -m ""


def _gen_xs():
    rng = random.Random(1307)
    xs = [0.5, 1.0, 2.0, 10.25, 0.1, 171.5, -0.5, -2.5, -19.99]
    # general range, nudged off the poles for x < 0.5
    while len(xs) < 45:
        x = rng.uniform(-20.0, 30.0)
        if x < 0.5 and abs(x - round(x)) < 1e-3:
            continue
        xs.append(round(x, 6))
    # large arguments: loggamma must not overflow (gamma may -> inf)
    xs += [1e3, 1e4 + 0.5, 1e6, 1e8 + 0.25]
    return xs


def test_gamma_loggamma_vs_duckdb_and_libm(spark):
    import duckdb

    xs = _gen_xs()
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                               "i int, x double")
    out = kql_to_df(
        {"T": df},
        "T | extend g = gamma(x), lg = loggamma(x) | project i, g, lg",
    ).collect()
    got = {r["i"]: (r["g"], r["lg"]) for r in out}

    duck = duckdb.connect()
    for i, x in enumerate(xs):
        want_lg = duck.sql(f"select lgamma({x!r}::DOUBLE)").fetchone()[0]
        g, lg = got[i]
        assert lg == pytest.approx(want_lg, rel=1e-11, abs=1e-11), (
            "loggamma", x, lg, want_lg)
        assert lg == pytest.approx(math.lgamma(x), rel=1e-11, abs=1e-11), (
            "loggamma/libm", x)
        want_g = math.gamma(x) if x < 170 else None
        if want_g is not None:
            assert g == pytest.approx(want_g, rel=1e-11), ("gamma", x, g)
        else:
            assert g == math.inf or g > 1e300, ("gamma overflow", x, g)


def test_gamma_identities(spark):
    # recurrence Gamma(x+1) = x*Gamma(x) and the exact half-integer /
    # factorial anchors, evaluated entirely in the engine
    df = spark.createDataFrame([(1,)], "id int")
    r = kql_to_df(
        {"T": df},
        "T | extend a = gamma(6), b = gamma(0.5) * gamma(0.5),"
        " c = gamma(4.7) / gamma(3.7), d = exp(loggamma(12))"
        " | project a, b, c, d",
    ).collect()[0]
    assert r["a"] == pytest.approx(120.0, rel=1e-12)
    assert r["b"] == pytest.approx(math.pi, rel=1e-12)
    assert r["c"] == pytest.approx(3.7, rel=1e-12)
    assert r["d"] == pytest.approx(math.factorial(11), rel=1e-10)
