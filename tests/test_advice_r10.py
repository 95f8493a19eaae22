"""Regression pins for the round-10 ADVICE items.

1. high — multi-column / with_itemindex mv-expand must DROP rows whose
   arrays are all empty/null (Kusto semantics); previously
   sequence(0, -1) returned [0, -1] (Spark defaults step to -1 when
   start > stop) and posexplode emitted 2 spurious null rows.
2. low — countof() terms containing backslashes must be doubled for
   the SQL string-literal layer (same discipline as has/split/trim);
   previously '\\\\' or '\\n' was re-interpreted by Spark's escaped
   string-literal parsing.
3. low — engagement_ratio shares ONE (user, day) distinct frame across
   its two interval-merge sweeps (ReusedExchange in the physical plan,
   not two independent event scans) and its docstring matches.
"""

import pytest

from azuredataengineering_deeplearning_spark.operators import timeseries as TS
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture(scope="module")
def arrays(spark):
    return spark.createDataFrame(
        [
            (1, [], []),
            (2, None, None),
            (3, [10], []),
            (4, [1, 2], [7, 8, 9]),
            (5, [], None),
        ],
        "id int, a array<int>, b array<int>",
    )


def _nullsort(rows):
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _rows(arrays, q):
    return [tuple(r) for r in kql_to_df({"E": arrays}, q).collect()]


def test_mv_expand_multicolumn_drops_all_empty_rows(arrays):
    # ids 1, 2, 5 have no elements in either array -> no output rows
    rows = _nullsort(_rows(arrays, "E | mv-expand a, b"))
    assert rows == [
        (3, 10, None),
        (4, 1, 7),
        (4, 2, 8),
        (4, None, 9),
    ]


def test_mv_expand_with_itemindex_drops_all_empty_rows(arrays):
    out = kql_to_df(
        {"E": arrays}, "E | mv-expand with_itemindex=ix a"
    ).select("id", "a", "ix")
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(3, 10, 0), (4, 1, 0), (4, 2, 1)]


def test_mv_expand_single_column_explode_unchanged(arrays):
    # single column, no itemindex: plain explode already drops empties
    rows = sorted(_rows(arrays, "E | mv-expand a"))
    assert rows == [(3, 10, []), (4, 1, [7, 8, 9]), (4, 2, [7, 8, 9])]


@pytest.fixture(scope="module")
def paths(spark):
    return spark.createDataFrame(
        [
            (1, "a\\b\\c"),
            (2, "no sep"),
            (3, "line1\nline2\nline3"),
            (4, "\\\\server\\share"),
            (5, "esc\\nok\\n"),
        ],
        "id int, p string",
    )


def _counts(paths, term):
    return {
        r["id"]: r["n"]
        for r in kql_to_df(
            {"E": paths}, f"E | extend n = countof(p, '{term}')"
        ).collect()
    }


def test_countof_backslash_term(paths):
    # term = one literal backslash character
    assert _counts(paths, "\\") == {1: 2, 2: 0, 3: 0, 4: 3, 5: 2}


def test_countof_backslash_n_term(paths):
    # term = the two RAW characters backslash + n (the dialect treats
    # KQL literals as raw, matching the has/split/trim rewrites) —
    # previously Spark's literal layer collapsed it to a newline
    assert _counts(paths, "\\n") == {1: 0, 2: 0, 3: 0, 4: 0, 5: 2}


def test_countof_plain_term_unchanged(paths):
    assert _counts(paths, "b") == {1: 1, 2: 0, 3: 0, 4: 0, 5: 0}


@pytest.mark.slow
def test_engagement_ratio_single_distinct_scan(spark):
    df = spark.createDataFrame(
        [("2024-01-0%d" % (i % 9 + 1), "u%d" % (i % 3)) for i in range(30)],
        "d string, u string",
    ).selectExpr("cast(d as timestamp) as ts", "u as user_id")
    out = TS.engagement_ratio(df, "ts", "user_id", 1, 7)
    rows = {r["day"].isoformat(): r for r in out.collect()}
    # the two sweeps must share the (user, day) distinct subtree —
    # inspect the POST-execution plan (AQE finalizes reuse at runtime)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    # day 1: 3 users active both in 1d and 7d windows -> ratio 1.0
    assert rows["2024-01-01"]["engagement"] == pytest.approx(1.0)
    assert "contribution-explode" not in (TS.engagement_ratio.__doc__ or "")
    assert "interval-merge" in TS.rolling_active_users.__doc__.lower() or (
        "INTERVAL-MERGE" in TS.rolling_active_users.__doc__
    )
