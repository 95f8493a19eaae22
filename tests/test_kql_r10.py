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
