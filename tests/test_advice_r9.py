"""Regression pins for the round-9 ADVICE items (all in sources/kql.py).

1. medium — contains/startswith/endswith must be case-INsensitive
   (Kusto: only the ``_cs`` variants compare case); previously they
   compiled to case-sensitive LIKE.
2. low — negated term operators (!has/!contains/!startswith/!endswith)
   must KEEP null rows (Kusto: null does not match); previously
   NOT(NULL)=NULL dropped them.
3. low — ``top N by X`` with no direction defaults to DESCENDING in
   every context (main pipe, partition-by sub-pipe, mv-apply).
4. low — top-nested ``with others=`` at level 0 must NOT emit a
   spurious 'Other' row when every key made the top set.
5. low — top-nested ``with others=`` on a non-string key raises a
   clear error instead of silently NULL-ing the label.
"""

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture(scope="module")
def mixed(spark):
    return spark.createDataFrame(
        [
            ("Alpha Beta", 1),
            ("alpha beta", 2),
            ("GAMMA", 3),
            (None, 4),
        ],
        "t string, id int",
    )


def _ids(mixed, q):
    return sorted(r["id"] for r in kql_to_df({"E": mixed}, q).collect())


def test_contains_case_insensitive(mixed):
    # Kusto: contains is case-insensitive -> both casings match
    assert _ids(mixed, "E | where t contains 'ALPHA'") == [1, 2]
    assert _ids(mixed, "E | where t startswith 'alpha'") == [1, 2]
    assert _ids(mixed, "E | where t endswith 'BETA'") == [1, 2]


def test_contains_cs_variants_case_sensitive(mixed):
    assert _ids(mixed, "E | where t contains_cs 'Alpha'") == [1]
    assert _ids(mixed, "E | where t startswith_cs 'alpha'") == [2]
    assert _ids(mixed, "E | where t endswith_cs 'Beta'") == [1]
    # negated _cs: case-sensitive AND null-safe (id=4 kept)
    assert _ids(mixed, "E | where t !contains_cs 'Alpha'") == [2, 3, 4]


def test_negated_term_ops_keep_null_rows(mixed):
    # Kusto: a null column does not match, so !op KEEPS the row (id=4)
    assert _ids(mixed, "E | where t !contains 'alpha'") == [3, 4]
    assert _ids(mixed, "E | where t !startswith 'alpha'") == [3, 4]
    assert _ids(mixed, "E | where t !endswith 'beta'") == [3, 4]
    assert _ids(mixed, "E | where t !has 'alpha'") == [3, 4]


def test_top_defaults_descending(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 9.0), ("c", 5.0)], "k string, v double"
    )
    got = [
        r["k"]
        for r in kql_to_df({"T": df}, "T | top 2 by v").collect()
    ]
    assert got == ["b", "c"]  # descending, not bottom-2
    # explicit asc still honored
    got_asc = [
        r["k"] for r in kql_to_df({"T": df}, "T | top 2 by v asc").collect()
    ]
    assert got_asc == ["a", "c"]


def test_partition_by_top_defaults_descending(spark):
    df = spark.createDataFrame(
        [("x", 1.0), ("x", 9.0), ("y", 3.0), ("y", 7.0)],
        "g string, v double",
    )
    got = sorted(
        (r["g"], r["v"])
        for r in kql_to_df(
            {"T": df}, "T | partition by g (top 1 by v)"
        ).collect()
    )
    assert got == [("x", 9.0), ("y", 7.0)]


def test_top_nested_others_no_spurious_row_when_all_keys_top(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    )
    out = kql_to_df(
        {"T": df},
        "T | top-nested 5 of k with others='Other' by s = sum(v)",
    ).collect()
    assert sorted(r["k"] for r in out) == ["a", "b"]  # no 'Other' row


def test_top_nested_others_still_emitted_when_rest_nonempty(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 2), ("c", 1)], "k string, v int"
    )
    rows = {
        r["k"]: r["s"]
        for r in kql_to_df(
            {"T": df},
            "T | top-nested 1 of k with others='Other' by s = sum(v)",
        ).collect()
    }
    assert rows == {"a": 10.0, "Other": 3.0}


def test_top_nested_others_numeric_key_raises(spark):
    df = spark.createDataFrame([(1, 10), (2, 2)], "k int, v int")
    with pytest.raises(ValueError, match="others label"):
        kql_to_df(
            {"T": df},
            "T | top-nested 1 of k with others='Other' by s = sum(v)",
        )
