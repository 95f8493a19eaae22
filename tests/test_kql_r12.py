"""Round-12 dialect gap closures (r11 verdict "What's missing",
lower-value list): ``scan output=all|last|none``, ``graph-to-table
nodes|edges``, and ``mv-expand bagexpansion=bag|array``.
"""

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


# --------------------------------------------------- scan output modes
@pytest.fixture(scope="module")
def scan_df(spark):
    rows = [
        (1, 1, "A", 10.0), (1, 2, "X", 0.0), (1, 3, "B", 20.0),
        (1, 4, "A", 5.0), (1, 5, "B", 7.0),
        (2, 1, "A", 1.0), (2, 2, "B", 2.0),
    ]
    return spark.createDataFrame(
        rows, "k int, seq int, ev string, v double"
    )


def test_scan_output_all_is_default(spark, scan_df):
    base = "T | sort by seq asc | scan by k with_match_id=m with (" \
           "step s1: ev == 'A'; step s2: ev == 'B')"
    dflt = kql_to_df({"T": scan_df}, base)
    explicit = kql_to_df(
        {"T": scan_df},
        base.replace("scan by k", "scan output=all by k"),
    )
    assert sorted(map(tuple, dflt.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    assert dflt.count() == 6  # 2 matches in k=1, 1 in k=2, 2 rows each


def test_scan_output_last_final_row_and_state(spark, scan_df):
    out = kql_to_df(
        {"T": scan_df},
        "T | sort by seq asc | scan output=last by k with_match_id=m"
        " declare (tot: real = 0) with ("
        " step s1: ev == 'A' => tot = tot + v;"
        " step s2: ev == 'B' => tot = tot + v)",
    )
    got = sorted((r["k"], r["seq"], r["m"], r["tot"]) for r in out.collect())
    # only each match's FINAL row survives, carrying the FINAL state
    assert got == [(1, 3, 0, 30.0), (1, 5, 1, 12.0), (2, 2, 0, 3.0)]


def test_scan_output_none_empty_same_schema(spark, scan_df):
    q = "T | sort by seq asc | scan output={} by k with_match_id=m" \
        " with (step s1: ev == 'A'; step s2: ev == 'B')"
    none = kql_to_df({"T": scan_df}, q.format("none"))
    alls = kql_to_df({"T": scan_df}, q.format("all"))
    assert none.count() == 0
    assert none.dtypes == alls.dtypes


def test_scan_output_invalid_raises(spark, scan_df):
    with pytest.raises(ValueError, match="all\\|last\\|none"):
        kql_to_df(
            {"T": scan_df},
            "T | sort by seq asc | scan output=first with ("
            "step s1: ev == 'A'; step s2: ev == 'B')",
        )


# ------------------------------------------------------ graph-to-table
@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 3.0),
         ("a", "c", 4.0)],
        "s string, d string, w double",
    )


def test_graph_to_table_edges(spark, edges_df):
    out = kql_to_df(
        {"T": edges_df}, "T | make-graph s --> d | graph-to-table edges"
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, edges_df.collect())
    )


def test_graph_to_table_nodes_plain_and_props(spark, edges_df):
    out = kql_to_df(
        {"T": edges_df}, "T | make-graph s --> d | graph-to-table nodes"
    )
    assert sorted(r["id"] for r in out.collect()) == ["a", "b", "c"]
    nodes = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta"), ("z", "zeta")],
        "nid string, label string",
    )
    out2 = kql_to_df(
        {"T": edges_df, "N": nodes},
        "T | make-graph s --> d with N on nid | graph-to-table nodes",
    )
    got = sorted((r["id"], r["label"]) for r in out2.collect())
    # endpoint-only node keeps null props; the bound node table's
    # degree-0 row z IS retained (Kusto's make-graph keeps isolated
    # nodes — r13 ADVICE fix)
    assert got == [("a", "alpha"), ("b", "beta"), ("c", None),
                   ("z", "zeta")]


def test_graph_to_table_bad_target_raises(spark, edges_df):
    with pytest.raises(ValueError, match="nodes.*edges|'nodes' or 'edges'"):
        kql_to_df(
            {"T": edges_df},
            "T | make-graph s --> d | graph-to-table nodes as N, edges as E",
        )


# ------------------------------------------- mv-expand bagexpansion
@pytest.fixture(scope="module")
def bag_df(spark):
    return spark.createDataFrame(
        [(1, {"x": "1", "y": "2"}), (2, {"z": "9"}), (3, {})],
        "rid int, b map<string,string>",
    )


def test_mv_expand_bag_default_single_entry_maps(spark, bag_df):
    out = kql_to_df({"T": bag_df}, "T | mv-expand b | project rid, b")
    got = sorted(
        (r["rid"], tuple(sorted(r["b"].items()))) for r in out.collect()
    )
    # one single-entry bag per row; the empty bag's row is dropped
    assert got == [
        (1, (("x", "1"),)), (1, (("y", "2"),)), (2, (("z", "9"),)),
    ]


def test_mv_expand_bagexpansion_array(spark, bag_df):
    out = kql_to_df(
        {"T": bag_df},
        "T | mv-expand bagexpansion=array with_itemindex=i b"
        " | project rid, i, b",
    )
    got = sorted((r["rid"], r["i"], tuple(r["b"])) for r in out.collect())
    assert got == [
        (1, 0, ("x", "1")), (1, 1, ("y", "2")), (2, 0, ("z", "9")),
    ]


def test_mv_expand_bagexpansion_ignored_for_arrays(spark):
    df = spark.createDataFrame([(1, [10, 20])], "rid int, a array<int>")
    out = kql_to_df(
        {"T": df}, "T | mv-expand bagexpansion=array a | project rid, a"
    )
    assert sorted((r["rid"], r["a"]) for r in out.collect()) == [
        (1, 10), (1, 20),
    ]


def test_mv_expand_bagexpansion_invalid_raises(spark, bag_df):
    with pytest.raises(ValueError, match="bag\\|array"):
        kql_to_df({"T": bag_df}, "T | mv-expand bagexpansion=list b")


# ------------------------------------- mv-expand limit / numeric axis
def test_mv_expand_limit_arrays_and_bags(spark):
    df = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [5])], "rid int, a array<int>"
    )
    out = kql_to_df({"T": df}, "T | mv-expand a limit 2 | project rid, a")
    assert sorted((r["rid"], r["a"]) for r in out.collect()) == [
        (1, 10), (1, 20), (2, 5),  # limit > len keeps everything
    ]
    bag = spark.createDataFrame(
        [(1, {"x": "1", "y": "2", "z": "3"})], "rid int, b map<string,string>"
    )
    out2 = kql_to_df(
        {"T": bag},
        "T | mv-expand bagexpansion=array b limit 2 | project rid, b",
    )
    assert sorted(tuple(r["b"]) for r in out2.collect()) == [
        ("x", "1"), ("y", "2"),
    ]


def test_make_series_numeric_axis(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.5, 7.0), (9.0, 1.0), (11.0, 99.0), (-1.0, 50.0)],
        "x double, v double",
    )
    r = kql_to_df(
        {"T": df}, "T | make-series s = sum(v) on x from 0 to 10 step 2"
    ).collect()[0]
    # out-of-range rows (11.0, -1.0) dropped; empty bins default 0
    assert r["s"] == [5.0, 7.0, 0.0, 0.0, 1.0]
    assert r["x"] == [0.0, 2.0, 4.0, 6.0, 8.0]
    # default=null marks gaps for series_fill_*
    r2 = kql_to_df(
        {"T": df},
        "T | make-series s = sum(v) default=null on x from 0 to 10 step 2",
    ).collect()[0]
    assert r2["s"] == [5.0, 7.0, None, None, 1.0]
    # bad ranges raise loudly
    with pytest.raises(ValueError, match="stop > start"):
        kql_to_df(
            {"T": df}, "T | make-series s = sum(v) on x from 10 to 0 step 2"
        )


# --------------------------------------------------- per-step output
def test_scan_per_step_output_none(spark, scan_df):
    out = kql_to_df(
        {"T": scan_df},
        "T | sort by seq asc | scan by k with_match_id=m with ("
        " step s1 output=none: ev == 'A'; step s2: ev == 'B')"
        " | project k, seq, m",
    )
    got = sorted((r["k"], r["seq"], r["m"]) for r in out.collect())
    # only the step-2 rows are emitted; the none-step rows still
    # advanced the machine (matches exist)
    assert got == [(1, 3, 0), (1, 5, 1), (2, 2, 0)]


def test_scan_per_step_output_none_keeps_state(spark, scan_df):
    out = kql_to_df(
        {"T": scan_df},
        "T | sort by seq asc | scan by k with_match_id=m"
        " declare (tot: real = 0) with ("
        " step s1 output=none: ev == 'A' => tot = tot + v;"
        " step s2: ev == 'B' => tot = tot + v)"
        " | project k, seq, m, tot",
    )
    got = sorted((r["k"], r["seq"], r["m"], r["tot"]) for r in out.collect())
    # the suppressed step-1 row's contribution is IN the emitted state
    assert got == [(1, 3, 0, 30.0), (1, 5, 1, 12.0), (2, 2, 0, 3.0)]


def test_scan_per_step_output_invalid_raises(spark, scan_df):
    with pytest.raises(ValueError, match="all\\|last\\|none"):
        kql_to_df(
            {"T": scan_df},
            "T | sort by seq asc | scan with ("
            " step s1 output=first: ev == 'A'; step s2: ev == 'B')",
        )


# --------------------------- dynamic indexing null-safety (ANSI mode)
def test_dynamic_indexing_out_of_range_is_null(spark):
    df = spark.createDataFrame(
        [(1, "a-b", [10, 20], {"k": "v"})],
        "rid int, s string, a array<int>, m map<string,string>",
    )
    out = kql_to_df(
        {"T": df},
        "T | extend s2 = split(s, '-')[5], a0 = a[1], a9 = a[9],"
        " neg = a[-1], mk = m['k'], miss = m['nope']"
        " | project s2, a0, a9, neg, mk, miss",
    ).collect()[0]
    # Kusto dynamic indexing: out-of-range / missing-key / negative
    # index are NULL — Spark ANSI [] would throw INVALID_ARRAY_INDEX
    assert out["s2"] is None
    assert out["a0"] == 20      # 0-based in-range still works
    assert out["a9"] is None
    assert out["neg"] is None
    assert out["mk"] == "v"
    assert out["miss"] is None


def test_countof_with_column_term(spark):
    df = spark.createDataFrame(
        [(1, "abcabc", "a"), (2, "xyx", "x"), (3, "zz", ""), (4, "m", None)],
        "rid int, s string, sub string",
    )
    out = kql_to_df(
        {"T": df}, "T | extend c = countof(s, sub) | project rid, c"
    ).collect()
    got = {r["rid"]: r["c"] for r in out}
    # empty/null term yields null (data condition), literal form stays
    # loud (query bug) — both pinned
    assert got == {1: 2, 2: 2, 3: None, 4: None}
    with pytest.raises(ValueError, match="non-empty"):
        kql_to_df({"T": df}, "T | extend c = countof(s, '')")
