"""Round-10 KQL additions: ``evaluate diffpatterns`` (deterministic
dialect of Kusto's cohort differ)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture(scope="module")
def cohorts(spark):
    rows = []
    # cohort A: 10 rows, 8 with x=red; cohort B: 20 rows, 4 with x=red
    for i in range(10):
        rows.append(("A", "red" if i < 8 else "blue", f"d{i % 2}"))
    for i in range(20):
        rows.append(("B", "red" if i < 4 else "blue", f"d{i % 2}"))
    return spark.createDataFrame(rows, "grp string, x string, d string")


def test_diffpatterns_scores_exact(cohorts):
    out = kql_to_df(
        {"T": cohorts}, "T | evaluate diffpatterns(grp, 'A', 'B', 0.05)"
    )
    rows = {
        (r["x"], r["d"]): (
            r["count_a"], r["count_b"],
            round(r["percent_diff_ab"], 6),
        )
        for r in out.collect()
    }
    # x=red: 80% of A vs 20% of B -> +60 points
    assert rows[("red", None)] == (8, 4, 60.0)
    # x=blue: 20% vs 80% -> -60 points
    assert rows[("blue", None)] == (2, 16, -60.0)
    # patterns under the 5-point bar (bare d0/d1 are 50/50 in both
    # cohorts -> diff 0) are excluded; composites with x still appear
    assert (None, "d0") not in rows and (None, "d1") not in rows
    assert all(abs(v[2]) >= 5.0 for v in rows.values())


def test_diffpatterns_ordering_largest_first(cohorts):
    out = kql_to_df(
        {"T": cohorts}, "T | evaluate diffpatterns(grp, 'A', 'B')"
    ).collect()
    diffs = [abs(r["percent_diff_ab"]) for r in out]
    assert diffs == sorted(diffs, reverse=True)


def test_diffpatterns_split_column_excluded_from_patterns(cohorts):
    out = kql_to_df(
        {"T": cohorts}, "T | evaluate diffpatterns(grp, 'A', 'B')"
    )
    assert "grp" not in out.columns
    assert set(out.columns) == {
        "x", "d", "count_a", "count_b",
        "percent_a", "percent_b", "percent_diff_ab",
    }


def test_diffpatterns_no_attribute_columns_raises(spark):
    df = spark.createDataFrame([("A", 1)], "grp string, n int")
    with pytest.raises(ValueError, match="diffpatterns"):
        kql_to_df({"T": df}, "T | evaluate diffpatterns(grp, 'A', 'B')")


def test_diffpatterns_malformed_raises(cohorts):
    with pytest.raises(ValueError, match="evaluate"):
        kql_to_df({"T": cohorts}, "T | evaluate diffpatterns(grp)")


def test_as_operator_binds_intermediate(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, v int"
    )
    out = kql_to_df(
        {"T": df},
        "T | summarize s = sum(v) by k | as Totals"
        " | join kind=inner (Totals) on k"
        " | project k, s, s1",
    )
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [("a", 3, 3), ("b", 5, 5)]


def test_as_operator_materialized_hint(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    out = kql_to_df(
        {"T": df},
        "T | extend v2 = v * 2 | as hint.materialized=true Snap"
        " | union (Snap)",
    )
    assert out.count() == 2


def test_as_operator_malformed(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="as needs"):
        kql_to_df({"T": df}, "T | as two words")


# ---- activity-analytics plugin family + rows_near (round 10) --------


@pytest.fixture(scope="module")
def activity(spark):
    # 3 users; u1 active days 1,2; u2 day 2 only; u3 days 1 and 5
    # (gap > lookback exercises interval splitting)
    rows = [
        (1, "2024-03-01 10:00:00"),
        (1, "2024-03-02 11:00:00"),
        (2, "2024-03-02 09:00:00"),
        (2, "2024-03-02 09:30:00"),
        (3, "2024-03-01 23:00:00"),
        (3, "2024-03-05 01:00:00"),
    ]
    return spark.createDataFrame(rows, "uid long, ts string").select(
        "uid", F.col("ts").cast("timestamp").alias("ts")
    )


def test_sliding_window_counts_values(activity):
    out = kql_to_df(
        {"T": activity},
        "T | evaluate sliding_window_counts(uid, ts,"
        " datetime(2024-03-01), datetime(2024-03-06), 2d, 1d)",
    )
    got = {
        r["Timeline"].strftime("%d"): (r["Count"], r["Dcount"])
        for r in out.collect()
    }
    # day: rows in (d-2d, d], distinct uids in same window
    assert got == {
        "01": (2, 2),          # u1d1, u3d1
        "02": (5, 3),          # + u1d2, u2 x2
        "03": (3, 2),          # u1d2, u2 x2 (day-1 aged out? no: (1,3])
        "04": (0, 0),          # days 3,4 empty
        "05": (1, 1),          # u3d5
        "06": (1, 1),          # u3d5 still in window
    }


def test_sliding_window_counts_lookback_not_multiple_raises(activity):
    with pytest.raises(Exception, match="multiple"):
        kql_to_df(
            {"T": activity},
            "T | evaluate sliding_window_counts(uid, ts,"
            " datetime(2024-03-01), datetime(2024-03-06), 5h, 2h)",
        )


def test_sliding_window_counts_arity(activity):
    with pytest.raises(Exception, match="6 args"):
        kql_to_df(
            {"T": activity},
            "T | evaluate sliding_window_counts(uid, ts, 1d)",
        )


def test_activity_counts_metrics_values(activity):
    out = kql_to_df(
        {"T": activity},
        "T | evaluate activity_counts_metrics(uid, ts,"
        " datetime(2024-03-01), datetime(2024-03-05), 1d)",
    )
    got = {
        r["Timeline"].strftime("%d"): (
            r["count_"], r["dcount"], r["new_dcount"], r["aggregated_dcount"]
        )
        for r in out.collect()
    }
    assert got == {
        "01": (2, 2, 2, 2),    # u1, u3 first seen
        "02": (3, 2, 1, 3),    # u1 again + u2 (new) x2
        "03": (0, 0, 0, 3),
        "04": (0, 0, 0, 3),
        "05": (1, 1, 0, 3),    # u3 returns — not new
    }


def test_activity_engagement_ratio(activity):
    out = kql_to_df(
        {"T": activity},
        "T | evaluate activity_engagement(uid, ts, 1d, 3d)",
    )
    got = {
        r["Timeline"].strftime("%d"): (
            r["dcount_activities_inner"],
            r["dcount_activities_outer"],
            round(r["activity_ratio"], 6),
        )
        for r in out.collect()
    }
    # observed days only (01, 02, 05); day 02: u1+u2 active that day,
    # u1+u2+u3 in the trailing 3d window
    assert got == {
        "01": (2, 2, 1.0),
        "02": (2, 3, 0.666667),
        "05": (1, 1, 1.0),
    }


def test_activity_engagement_subday_window_raises(activity):
    with pytest.raises(Exception, match="whole days"):
        kql_to_df(
            {"T": activity},
            "T | evaluate activity_engagement(uid, ts, 12h, 3d)",
        )


@pytest.mark.slow
def test_rows_near_window_and_boundaries(spark):
    rows = [(i, "hit" if i in (3, 9) else "x") for i in range(1, 11)]
    df = spark.createDataFrame(rows, "i int, tag string")
    out = kql_to_df(
        {"T": df},
        "T | sort by i asc | evaluate rows_near(tag == 'hit', 1)",
    )
    assert sorted(r["i"] for r in out.collect()) == [2, 3, 4, 8, 9, 10]
    # asymmetric form: 0 before, 2 after
    out2 = kql_to_df(
        {"T": df},
        "T | sort by i asc | evaluate rows_near(tag == 'hit', 0, 2)",
    )
    assert sorted(r["i"] for r in out2.collect()) == [3, 4, 5, 9, 10]


@pytest.mark.slow
def test_rows_near_overlapping_matches_dedupe(spark):
    df = spark.createDataFrame(
        [(i, "hit" if i in (4, 5) else "x") for i in range(1, 9)],
        "i int, tag string",
    )
    out = kql_to_df(
        {"T": df},
        "T | sort by i asc | evaluate rows_near(tag == 'hit', 2)",
    )
    # coverage [2,7] from both hits — each row exactly once
    assert sorted(r["i"] for r in out.collect()) == [2, 3, 4, 5, 6, 7]


def test_rows_near_requires_sort(spark):
    df = spark.createDataFrame([(1, "x")], "i int, tag string")
    with pytest.raises(Exception, match="sort by"):
        kql_to_df({"T": df}, "T | evaluate rows_near(tag == 'x', 1)")


# ---- find / sample-distinct / parse-kv / invoke (round 10) -----------


@pytest.fixture(scope="module")
def two_tables(spark):
    a = spark.createDataFrame(
        [(1, "click", 10.0), (2, "error", 95.0), (3, "view", 50.0),
         (4, "error", 20.0)],
        "id long, et string, v double",
    )
    b = spark.createDataFrame(
        [(10, "purchase", 99.0), (11, "error", 1.0)],
        "id long, et string, v double",
    )
    c = spark.createDataFrame([(7, "error")], "id long, et string")
    return {"A": a, "B": b, "C": c}


def test_find_common_columns_default(two_tables):
    out = kql_to_df(
        two_tables, "find in (A, B) where et == 'error' | sort by id asc"
    )
    assert out.columns == ["source_", "id", "et", "v"]
    assert [(r["source_"], r["id"]) for r in out.collect()] == [
        ("A", 2), ("A", 4), ("B", 11)
    ]


def test_find_project_missing_column_typed_null(two_tables):
    out = kql_to_df(
        two_tables,
        "find withsource=tbl in (A, C) where et == 'error' project id, v",
    )
    rows = {r["id"]: (r["tbl"], r["v"]) for r in out.collect()}
    assert rows == {2: ("A", 95.0), 4: ("A", 20.0), 7: ("C", None)}


def test_find_predicate_on_absent_column_drops_table(two_tables):
    # C has no v column: null > 15 is never true, so C contributes 0 rows
    out = kql_to_df(two_tables, "find in (A, C) where v > 15 project id")
    assert sorted(r["id"] for r in out.collect()) == [2, 3, 4]


def test_find_errors(two_tables):
    with pytest.raises(ValueError, match="unknown tables"):
        kql_to_df(two_tables, "find in (A, Zed) where et == 'x'")
    d = two_tables["A"].selectExpr("id as other")
    with pytest.raises(ValueError, match="share no columns"):
        kql_to_df(
            {"A": two_tables["A"].select("et"), "D": d},
            "find in (A, D) where et == 'x'",
        )


def test_sample_distinct_deterministic_and_complete(two_tables):
    full = kql_to_df(two_tables, "A | sample-distinct 10 of et")
    assert sorted(r["et"] for r in full.collect()) == [
        "click", "error", "view"
    ]
    two1 = sorted(
        r["et"]
        for r in kql_to_df(two_tables, "A | sample-distinct 2 of et").collect()
    )
    two2 = sorted(
        r["et"]
        for r in kql_to_df(two_tables, "A | sample-distinct 2 of et").collect()
    )
    assert len(two1) == 2 and two1 == two2
    with pytest.raises(ValueError, match="N of Col"):
        kql_to_df(two_tables, "A | sample-distinct et")


def test_parse_kv_types_and_absent_keys(spark):
    kv = spark.createDataFrame([("a=1 b=x c=2.5",), ("b=y",)], "s string")
    out = kql_to_df(
        {"T": kv}, "T | parse-kv s as (a: long, b: string, c: real)"
    )
    assert [(r["a"], r["b"], r["c"]) for r in out.collect()] == [
        (1, "x", 2.5), (None, "y", None)
    ]


def test_parse_kv_regex_metachar_delimiters(spark):
    kv = spark.createDataFrame([("a:1|b:z.z",)], "s string")
    out = kql_to_df(
        {"T": kv},
        "T | parse-kv s as (a: int, b: string)"
        " with (pair_delimiter='|', kv_delimiter=':')",
    )
    r = out.collect()[0]
    assert (r["a"], r["b"]) == (1, "z.z")


def test_parse_kv_errors(spark):
    kv = spark.createDataFrame([("a=1",)], "s string")
    with pytest.raises(ValueError, match="unknown type"):
        kql_to_df({"T": kv}, "T | parse-kv s as (a: decimal)")
    with pytest.raises(ValueError, match="unknown option"):
        kql_to_df(
            {"T": kv}, "T | parse-kv s as (a: int) with (quote='x')"
        )


def test_invoke_lambda_with_scalar_args(two_tables):
    q = (
        "let topv = (t:(*), n:long) { t | sort by v desc | take n };"
        " A | where et != 'view' | invoke topv(2) | project id, v"
    )
    got = sorted((r["id"], r["v"]) for r in kql_to_df(two_tables, q).collect())
    assert got == [(2, 95.0), (4, 20.0)]
    q2 = (
        "let above = (t:(*), cut:real) { t | where v > cut };"
        " A | invoke above(40.0) | project id"
    )
    assert sorted(
        r["id"] for r in kql_to_df(two_tables, q2).collect()
    ) == [2, 3]


def test_invoke_errors(two_tables):
    with pytest.raises(ValueError, match="let-bound tabular function"):
        kql_to_df(two_tables, "A | invoke nosuch()")
    with pytest.raises(ValueError, match="expected 1 scalar"):
        kql_to_df(
            two_tables,
            "let f = (t:(*), k:long) { t | take k }; A | invoke f()",
        )
    # self-referencing lambda fails loudly (lambdas don't propagate)
    with pytest.raises(ValueError, match="let-bound tabular function"):
        kql_to_df(
            two_tables,
            "let bad = (t:(*)) { t | invoke bad() }; A | invoke bad()",
        )


def test_parse_kv_nonconvertible_value_yields_null(spark):
    # r11 fuzzer catch: Kusto yields NULL when a value does not convert
    # to the declared type; an ANSI cast killed the whole query
    kv = spark.createDataFrame(
        [("a=6.95 b=xyz c=12",), ("a=3 b=4 c=oops",)], "s string"
    )
    out = kql_to_df(
        {"T": kv}, "T | parse-kv s as (a: long, c: long)"
    )
    assert [(r["a"], r["c"]) for r in out.collect()] == [
        (None, 12), (3, None)
    ]
