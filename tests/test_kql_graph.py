"""Kusto make-graph / graph-match (round 10): pattern compilation to
joins — chains, cycles, shared variables, any-direction edges, node
decoration, and the loud-error contract."""

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df
from azuredataengineering_deeplearning_spark.sources.kql_graph import (
    parse_pattern,
)


@pytest.fixture()
def tri(spark):
    return spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 3.0), ("a", "c", 4.0)],
        "s string, d string, w double",
    )


@pytest.fixture()
def nodes(spark):
    return spark.createDataFrame(
        [("a", "alpha"), ("b", "beta"), ("c", "gamma")],
        "nid string, label string",
    )


def test_two_hop_chain(spark, tri):
    out = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-[p]->(y)-[q]->(z)"
        " project x = x.id, z = z.id, tw = p.w + q.w",
    ).collect()
    got = {(r["x"], r["z"]): r["tw"] for r in out}
    # a->b->c (1+2), b->c->a (2+3), c->a->b (3+1), c->a->c (3+4),
    # a->c->a (4+3)
    assert got[("a", "c")] == 3.0 and got[("b", "a")] == 5.0
    assert got[("c", "b")] == 4.0
    assert got[("c", "c")] == 7.0 and got[("a", "a")] == 7.0
    assert len(out) == 5


def test_triangle_cycle_shared_vars(spark, tri):
    out = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-[p]->(y)-[q]->(z), (z)-[r]->(x)"
        " project x = x.id, y = y.id, z = z.id",
    ).collect()
    rows = sorted((r["x"], r["y"], r["z"]) for r in out)
    assert rows == [("a", "b", "c"), ("b", "c", "a"), ("c", "a", "b")]


def test_self_loop_var(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b")], "s string, d string"
    )
    out = kql_to_df(
        {"t": df},
        "t | make-graph s --> d | graph-match (x)-[e]->(x) project x = x.id",
    ).collect()
    assert [r["x"] for r in out] == ["a"]


def test_any_direction_and_reverse(spark, tri):
    rev = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)<-[e]-(y) where x.id == 'c' project y = y.id",
    ).collect()
    assert sorted(r["y"] for r in rev) == ["a", "b"]  # b->c, a->c
    anyd = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-[e]-(y) where y.id == 'b' project x = x.id",
    ).collect()
    assert sorted(r["x"] for r in anyd) == ["a", "c"]  # a->b fwd, b->c rev


def test_node_decoration_left_join(spark, tri, nodes):
    # node 'c' removed from the table: structure still matches, label null
    out = kql_to_df(
        {"t": tri, "nd": nodes.where("nid != 'c'")},
        "t | make-graph s --> d with nd on nid"
        " | graph-match (x)-[e]->(y)"
        " project x = x.label, y = y.label, yid = y.id",
    ).collect()
    by_yid = {(r["x"], r["yid"]): r["y"] for r in out}
    assert by_yid[("alpha", "b")] == "beta"
    assert by_yid[("alpha", "c")] is None  # decoration is LEFT, not filter


def test_pipe_continues_after_graph_match(spark, tri):
    out = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-[e]->(y) project x = x.id, w = e.w"
        " | summarize n = count(), tw = sum(w) by x | sort by x asc",
    ).collect()
    assert [(r["x"], r["n"], r["tw"]) for r in out] == [
        ("a", 2, 5.0), ("b", 1, 2.0), ("c", 1, 3.0),
    ]


def test_parse_pattern_shapes():
    hops, order, varlen = parse_pattern("(a)-[e]->(b)<-[f]-(c)")
    assert hops == [("a", "e", "b", "fwd"), ("c", "f", "b", "fwd")]
    assert order == ["a", "b", "c"] and varlen == {}
    hops, _, _ = parse_pattern("(a)-->(b)")
    assert hops[0][3] == "fwd" and hops[0][1].startswith("__e")
    hops, _, _ = parse_pattern("(a)--(b)")
    assert hops[0][3] == "any"
    hops, _, varlen = parse_pattern("(a)-[p*1..3]->(b)")
    assert varlen == {"p": (1, 3)}


def test_graph_errors(spark, tri):
    t = {"t": tri}
    with pytest.raises(ValueError, match="needs a preceding make-graph"):
        kql_to_df(t, "t | graph-match (a)-[e]->(b) project a = a.id")
    with pytest.raises(ValueError, match="only graph-match / graph-shortest-paths"):
        kql_to_df(t, "t | make-graph s --> d | where w > 1")
    with pytest.raises(ValueError, match="no edge column"):
        kql_to_df(t, "t | make-graph s --> nope")
    with pytest.raises(ValueError, match="unknown table"):
        kql_to_df(t, "t | make-graph s --> d with missing on nid")
    with pytest.raises(ValueError, match="used twice"):
        kql_to_df(
            t,
            "t | make-graph s --> d"
            " | graph-match (a)-[e]->(b), (b)-[e]->(c) project a = a.id",
        )
    with pytest.raises(ValueError, match="shares no variable"):
        kql_to_df(
            t,
            "t | make-graph s --> d"
            " | graph-match (a)-[e]->(b), (x)-[f]->(y) project a = a.id",
        )
    with pytest.raises(ValueError, match="unparseable pattern"):
        parse_pattern("(a)-[e]->(b)(c)-[f]->(d)")


def test_anonymous_middle_node(spark, tri):
    # () mints ONE name shared by both hops — a 2-hop reach query
    out = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-->()-->(z) project x = x.id, z = z.id",
    ).collect()
    assert sorted((r["x"], r["z"]) for r in out) == [
        ("a", "a"), ("a", "c"), ("b", "a"), ("c", "b"), ("c", "c"),
    ]


def test_varlen_path_reachability(spark, tri):
    # paths a ->*1..2 ? : length-1 (4 edges) + length-2 (5 chains)
    out = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-[p*1..2]->(z)"
        " project x = x.id, z = z.id, n = array_length(p)",
    ).collect()
    assert len(out) == 9
    assert sorted(
        (r["x"], r["z"]) for r in out if r["n"] == 1
    ) == [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")]


def test_varlen_path_functions(spark, tri):
    # map/all/any over the edge array; path cost via array arithmetic
    out = kql_to_df(
        {"t": tri},
        "t | make-graph s --> d"
        " | graph-match (x)-[p*2..2]->(z)"
        " where all(p, w < 4.0) and any(p, w > 2.0)"
        " project x = x.id, z = z.id, ws = map(p, w)",
    ).collect()
    got = {(r["x"], r["z"]): r["ws"] for r in out}
    # survivors: b->c->a ([2,3]) and c->a->b ([3,1]); a->b->c ([1,2])
    # fails any(w > 2.0) (strict), chains through a->c fail all(w < 4.0)
    assert got[("b", "a")] == [2.0, 3.0]
    assert got[("c", "b")] == [3.0, 1.0]
    assert ("a", "c") not in got
    assert len(out) == 2


def test_varlen_validation():
    with pytest.raises(ValueError, match="need 1 <= min <= max"):
        parse_pattern("(a)-[p*0..2]->(b)")
    with pytest.raises(ValueError, match="need 1 <= min <= max"):
        parse_pattern("(a)-[p*3..2]->(b)")
    with pytest.raises(ValueError, match="max 8"):
        parse_pattern("(a)-[p*1..20]->(b)")


# ---- graph-shortest-paths (round 11) ---------------------------------

@pytest.fixture()
def chaing(spark):
    # a->b->c->d plus a shortcut a->c and a long spur d->e
    return spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0),
         ("a", "c", 5.0), ("d", "e", 1.0)],
        "s string, d string, w double",
    )


def test_shortest_paths_min_hops_any(spark, chaing):
    out = kql_to_df(
        {"t": chaing},
        "t | make-graph s --> d"
        " | graph-shortest-paths (x)-[e*1..4]->(y)"
        " where x.id == 'a'"
        " project src = x.id, dst = y.id, hops = array_length(e)",
    )
    got = {(r["src"], r["dst"]): r["hops"] for r in out.collect()}
    # a->b (1), a->c (1, the direct shortcut beats a->b->c), a->d (2
    # via the shortcut), a->e (3)
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2,
                   ("a", "e"): 3}
    # output=any: exactly one row per pair
    assert out.count() == 4


def test_shortest_paths_output_all_keeps_ties(spark):
    # two distinct 2-hop paths a->*->z, no shorter route
    g = spark.createDataFrame(
        [("a", "m1", 1.0), ("a", "m2", 1.0),
         ("m1", "z", 1.0), ("m2", "z", 1.0)],
        "s string, d string, w double",
    )
    base = (
        "t | make-graph s --> d"
        " | graph-shortest-paths {out}(x)-[e*1..3]->(z)"
        " where x.id == 'a' and z.id == 'z'"
        " project mid = map(e, d)"
    )
    allp = kql_to_df({"t": g}, base.format(out="output=all "))
    anyp = kql_to_df({"t": g}, base.format(out=""))
    mids = sorted(tuple(r["mid"]) for r in allp.collect())
    assert mids == [("m1", "z"), ("m2", "z")]
    # deterministic single pick: the least (hops, projected) tuple
    assert [tuple(r["mid"]) for r in anyp.collect()] == [("m1", "z")]


def test_shortest_paths_where_prunes_paths(spark, chaing):
    # forbid the shortcut edge -> a..c now costs 2 hops
    out = kql_to_df(
        {"t": chaing},
        "t | make-graph s --> d"
        " | graph-shortest-paths (x)-[e*1..4]->(y)"
        " where x.id == 'a' and y.id == 'c' and all(e, w < 2)"
        " project hops = array_length(e)",
    )
    assert [r["hops"] for r in out.collect()] == [2]


def test_shortest_paths_errors_loud(spark, chaing):
    t = {"t": chaing}
    with pytest.raises(ValueError, match="variable-length"):
        kql_to_df(
            t, "t | make-graph s --> d | graph-shortest-paths"
            " (x)-[e]->(y) project a = x.id",
        )
    with pytest.raises(ValueError, match="output="):
        kql_to_df(
            t, "t | make-graph s --> d | graph-shortest-paths"
            " output=some (x)-[e*1..2]->(y) project a = x.id",
        )
    with pytest.raises(ValueError, match="preceding make-graph"):
        kql_to_df(t, "t | graph-shortest-paths (x)-[e*1..2]->(y)"
                     " project a = x.id")
