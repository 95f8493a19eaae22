"""Round-12 scalar-function fuzzer: generated KQL scalar expressions
over a seeded edge-value frame, each asserted against an INDEPENDENT
DuckDB twin that encodes the SAME documented Kusto semantics with
DuckDB's own primitives (strpos/string_split/date_diff/date_trunc —
foreign implementations, not echoes of the translation).

Families and their twin constructions:
- substring(s, i, n): 0-based → DuckDB substr(s, i+1, n) (over-end
  windows yield '' in both engines).
- indexof(s, sub): 0-based, absent = -1 → strpos(s, sub) - 1.
- split(s, d)[k]: 0-based indexing → string_split(s, d)[k+1]
  (out-of-range list index is NULL in DuckDB, like try_element_at).
- countof(s, sub): length-difference identity in DuckDB text ops.
- replace_string / strcat_delim / tolower / reverse: direct DuckDB
  text twins.
- trim/trim_start/trim_end('c', s): REGEX trim → anchored
  regexp_replace.
- datetime_diff(period, a, b): period-BOUNDARY counting → DuckDB
  date_diff(period, b, a) (its native convention; 'week' excluded —
  the dialect documents ISO-Monday weeks vs Kusto Sunday).
- datetime_add / endofmonth / startofyear / getyear/getmonth/
  hourofday/dayofmonth: interval arithmetic + date_part twins;
  endofmonth = next month start minus 1 microsecond.
- bin(x, sz) numeric (incl. negative x) and bin(ts, 1h): floor
  arithmetic over epoch seconds.
"""

import datetime as dt
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


_WORDS = ["abcabc", "xyx", "hello world", "a-b-c-d", "zz", "m",
          "abc abc abc", "x,y,,z", "  pad  ", "aaa"]


@pytest.fixture(scope="module")
def sc_ctx(spark):
    import duckdb

    rng = random.Random(1212)
    rows = []
    for rid in range(40):
        s = rng.choice(_WORDS)
        sub = rng.choice(["a", "b", "c", "x", " ", "ab"])
        i = rng.randrange(0, 8)
        n = rng.randrange(0, 6)
        ts = dt.datetime(2023, 1, 1) + dt.timedelta(
            days=rng.randrange(0, 900),
            seconds=rng.randrange(0, 86400),
            microseconds=rng.randrange(0, 1_000_000),
        )
        x = round(rng.uniform(-100, 100), 3)
        rows.append((rid, s, sub, i, n, ts, x))
    sdf = spark.createDataFrame(
        rows, "rid int, s string, sub string, i int, n int,"
        " ts timestamp, x double"
    ).cache()
    sdf.count()
    duck = duckdb.connect()
    duck.register(
        "SC",
        pd.DataFrame(
            rows, columns=["rid", "s", "sub", "i", "n", "ts", "x"]
        ),
    )
    yield {"df": sdf, "duck": duck}
    sdf.unpersist()


def _check(ctx, kql_expr, duck_expr, label, cast=None):
    got = kql_to_df(
        {"T": ctx["df"]}, f"T | extend z = {kql_expr} | project rid, z"
    )
    if cast:
        got = got.selectExpr("rid", f"cast(z as {cast}) as z")
    want_sql = f"SELECT rid, {duck_expr} AS z FROM SC"
    g, w = frame_hash(got.toPandas()), frame_hash(ctx["duck"].sql(want_sql).df())
    assert g[0] > 0, f"VACUOUS [{label}]"
    assert g == w, f"SCALAR MISMATCH [{label}]\n kql: {kql_expr}\n sql: {duck_expr}"


def test_fuzz_scalar_text_family(sc_ctx):
    cases = [
        ("substring(s, i, n)",
         "CASE WHEN n = 0 THEN '' ELSE substr(s, i + 1, n) END", None),
        ("indexof(s, sub)",
         "CAST(strpos(s, sub) - 1 AS INT)", "int"),
        ("split(s, '-')[1]", "string_split(s, '-')[2]", None),
        ("split(s, ' ')[0]", "string_split(s, ' ')[1]", None),
        ("countof(s, sub)",
         "CAST((len(s) - len(replace(s, sub, ''))) / len(sub) AS BIGINT)",
         "long"),
        ("replace_string(s, sub, '#')", "replace(s, sub, '#')", None),
        ("strcat_delim('-', s, sub)", "s || '-' || sub", None),
        ("tolower(s)", "lower(s)", None),
        ("reverse(s)", "reverse(s)", None),
        ("trim('a', s)",
         "regexp_replace(regexp_replace(s, '^(a)+', ''), '(a)+$', '')",
         None),
        ("trim_start('a', s)", "regexp_replace(s, '^(a)+', '')", None),
        ("trim_end('a', s)", "regexp_replace(s, '(a)+$', '')", None),
        ("strlen(s)", "CAST(len(s) AS BIGINT)", "long"),
    ]
    for k, d, c in cases:
        _check(sc_ctx, k, d, f"text:{k}", cast=c)


def test_fuzz_scalar_datetime_family(sc_ctx):
    anchor = "datetime(2024-03-15 12:34:56)"
    da = "TIMESTAMP '2024-03-15 12:34:56'"
    cases = [
        (f"datetime_diff('day', ts, {anchor})",
         f"CAST(date_diff('day', {da}, ts) AS BIGINT)", "long"),
        (f"datetime_diff('hour', ts, {anchor})",
         f"CAST(date_diff('hour', {da}, ts) AS BIGINT)", "long"),
        (f"datetime_diff('month', ts, {anchor})",
         f"CAST(date_diff('month', {da}, ts) AS BIGINT)", "long"),
        (f"datetime_diff('year', ts, {anchor})",
         f"CAST(date_diff('year', {da}, ts) AS BIGINT)", "long"),
        (f"datetime_diff('minute', ts, {anchor})",
         f"CAST(date_diff('minute', {da}, ts) AS BIGINT)", "long"),
        ("datetime_add('day', i, ts)",
         "ts + to_days(CAST(i AS INTEGER))", None),
        ("datetime_add('hour', n, ts)",
         "ts + to_hours(CAST(n AS INTEGER))", None),
        ("getyear(ts)", "CAST(date_part('year', ts) AS INT)", "int"),
        ("getmonth(ts)", "CAST(date_part('month', ts) AS INT)", "int"),
        ("hourofday(ts)", "CAST(date_part('hour', ts) AS INT)", "int"),
        ("dayofmonth(ts)", "CAST(date_part('day', ts) AS INT)", "int"),
        ("startofyear(ts)", "date_trunc('year', ts)", None),
        ("endofmonth(ts)",
         "date_trunc('month', ts) + INTERVAL 1 MONTH"
         " - INTERVAL 1 MICROSECOND", None),
        ("bin(ts, 1h)",
         "CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP)",
         None),
        ("bin(ts, 1d)",
         "CAST(to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)) AS TIMESTAMP)",
         None),
    ]
    for k, d, c in cases:
        _check(sc_ctx, k, d, f"dt:{k}", cast=c)


def test_fuzz_scalar_numeric_family(sc_ctx):
    cases = [
        # engine bin with an INTEGER size returns long (Spark floor ->
        # long; Kusto would give real — value-identical, documented
        # typing deviation), so compare as double on both sides
        ("bin(x, 10)", "floor(x / 10) * 10", "double"),
        ("bin(x, 2.5)", "floor(x / 2.5) * 2.5", "double"),  # decimal literal -> Decimal objects otherwise
        # negative values: floor-based binning rounds toward -inf in
        # BOTH engines (the classic trunc-vs-floor divergence trap)
        ("bin(x, 7)", "floor(x / 7) * 7", "double"),
        ("abs(x) + i", "abs(x) + i", None),
        ("iff(x > 0, 1, -1)", "CASE WHEN x > 0 THEN 1 ELSE -1 END",
         "int"),
        ("toint(x)",
         "CAST(CASE WHEN x >= 0 THEN floor(x) ELSE ceil(x) END AS INT)",
         "int"),
    ]
    for k, d, c in cases:
        _check(sc_ctx, k, d, f"num:{k}", cast=c)
