"""Round-7 regression tests for the r6 ADVICE findings.

Each test pins a concrete failure mode found by the round-6 advisor:

1. ``resolve_clusters`` tail-gear bail kept a stale overlay that the
   final merge could resurrect over a smaller label (component split).
2. KQL ``prev``/``next`` self-join evaluated the row numbering in two
   plan branches; with tied sort keys the branches could disagree.
3. ``quantile_transform`` global path dropped NULL values at the rank
   join (NULL never equi-joins), diverging from the keyed path.
4. ``embedding_near_duplicates`` hard-coded int64 ids, breaking the
   generic ``id_col`` contract for string doc ids; and nothing guarded
   its documented bounded-side driver collect.
"""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators import dedup as DD
from azuredataengineering_deeplearning_spark.operators.encoders import (
    quantile_transform,
)
from azuredataengineering_deeplearning_spark.operators import similarity as SIM
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _union_find(edges):
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


# ---------------------------------------------------------------------------
# 1. resolve_clusters: tail-gear bail must not strand the overlay
# ---------------------------------------------------------------------------

# Two-wave lollipop that drove the pre-fix kernel wrong (hub nodes kept
# the stale override 1 instead of the true component min 0): a fast
# seed (1) crawls a tail chain into the tail gear and writes overrides,
# the hub (12-50/51/52) blows the candidate set -> bail, and the slow
# seed (0) only reaches the hub via the distributed rounds AFTER the
# bail. Pre-fix, the final coalesce resurrected the stale override.
BAIL_LOLLIPOP = [
    (1, 10), (10, 11), (11, 12), (12, 50), (12, 51), (12, 52),
    (0, 100), (100, 101), (101, 102), (102, 103), (103, 1),
]


@pytest.mark.slow
def test_resolve_clusters_bail_flushes_overlay(spark):
    pairs = spark.createDataFrame(BAIL_LOLLIPOP, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in DD.resolve_clusters(
            pairs, max_iter=60, jump_from=100, frontier_threshold=2
        ).collect()
    }
    assert got == _union_find(BAIL_LOLLIPOP)


@pytest.mark.parametrize("threshold", [1, 2, 3])
@pytest.mark.parametrize("jump_from", [1, 100])
def test_resolve_clusters_tiny_frontier_thresholds(spark, threshold, jump_from):
    # sweep the gear boundaries: every (engage, bail, re-engage)
    # interleaving over the lollipop must still match union-find
    pairs = spark.createDataFrame(BAIL_LOLLIPOP, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in DD.resolve_clusters(
            pairs, max_iter=60, jump_from=jump_from, frontier_threshold=threshold
        ).collect()
    }
    assert got == _union_find(BAIL_LOLLIPOP)


# ---------------------------------------------------------------------------
# 2. KQL prev/next under tied sort keys
# ---------------------------------------------------------------------------


def test_kql_prev_consistent_under_ties(spark):
    rows = [
        (1, "a", 10.0), (1, "b", 20.0), (1, "c", 30.0),
        (2, "d", 40.0), (2, "e", 50.0),
    ]
    tdf = spark.createDataFrame(rows, "k long, name string, val double")
    out = kql_to_df({"T": tdf}, "T | sort by k asc | extend d = val - prev(val)")
    res = out.collect()
    # KQL serialize over non-unique sort keys may pick any total order,
    # but it must be ONE order: exactly one row has no prev, every
    # consumed prev-value is a real row value, and no value is consumed
    # twice (pre-fix, the shifted branch could renumber ties and pair a
    # row with the wrong neighbor or itself).
    nulls = [r for r in res if r["d"] is None]
    assert len(nulls) == 1
    consumed = [round(r["val"] - r["d"], 6) for r in res if r["d"] is not None]
    assert len(set(consumed)) == len(consumed)
    vals = {r["val"] for r in res}
    assert set(consumed) <= vals
    # the max-val row is last in any k-asc serialization of this data
    # only if ties break that way — but 50.0 (unique k=2 tail) always
    # has a prev from k<=2, and 10/20/30 share k=1: self-pairing is the
    # bug signature
    assert all(r["d"] != 0.0 for r in res if r["d"] is not None)


# ---------------------------------------------------------------------------
# 3. quantile_transform: NULL values keep their rank on the global path
# ---------------------------------------------------------------------------


def test_quantile_transform_global_nulls_match_keyed(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0), (4, None), (5, 9.0), (6, 5.0)],
        "id long, v double",
    )
    g = quantile_transform(df, [], "v").orderBy("id").collect()
    k = (
        quantile_transform(df.withColumn("__k", F.lit(1)), ["__k"], "v")
        .orderBy("id")
        .collect()
    )
    for a, b in zip(g, k):
        assert a["v_q"] is not None, "global path dropped the NULL group"
        assert abs(a["v_q"] - b["v_q"]) < 1e-12
    # nulls rank FIRST (percent_rank semantics): rank 0.0
    by_id = {r["id"]: r["v_q"] for r in g}
    assert by_id[2] == 0.0 and by_id[4] == 0.0


# ---------------------------------------------------------------------------
# 4. embedding_near_duplicates: generic ids + bounded-side guard
# ---------------------------------------------------------------------------


def _vec_rows():
    return [
        ("doc-a", [1.0, 0.0, 0.0]),
        ("doc-b", [0.999, 0.01, 0.0]),   # near-dup of doc-a
        ("doc-c", [0.0, 1.0, 0.0]),
        ("doc-d", [0.0, 0.0, 1.0]),
    ]


def test_embedding_near_duplicates_string_ids(spark):
    df = spark.createDataFrame(
        _vec_rows(), "vec_id string, embedding array<double>"
    )
    got = SIM.embedding_near_duplicates(df, threshold=0.9).collect()
    assert len(got) == 1
    (r,) = got
    assert (r["id_a"], r["id_b"]) == ("doc-a", "doc-b")  # value-ordered
    assert r["cos"] > 0.99
    # schema follows the input id type
    assert dict(SIM.embedding_near_duplicates(df, threshold=0.9).dtypes)[
        "id_a"
    ] == "string"


def test_embedding_near_duplicates_long_ids_unchanged(spark):
    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(_vec_rows())],
        "vec_id long, embedding array<double>",
    )
    got = SIM.embedding_near_duplicates(df, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]


def test_embedding_near_duplicates_cap_guard(spark):
    df = spark.createDataFrame(
        _vec_rows(), "vec_id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        SIM.embedding_near_duplicates(df, max_collect=2)


def test_numpy_topk_query_cap_guard(spark):
    df = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(_vec_rows())],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ivf_topk"):
        SIM.numpy_topk(df, df, max_collect=2)


def test_resolve_clusters_bail_trigger_observed(spark):
    # whitebox: the hub graph must actually take the engage -> bail ->
    # re-resolve path (not just produce right answers by luck), and the
    # collected candidate set is bounded by frontier_threshold + 1 rows
    # regardless of hub degree (the limit() caps the driver collect).
    events: list = []
    pairs = spark.createDataFrame(BAIL_LOLLIPOP, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in DD.resolve_clusters(
            pairs,
            max_iter=60,
            jump_from=100,
            frontier_threshold=2,
            debug_events=events,
        ).collect()
    }
    assert "tail_engage" in events and "tail_bail" in events
    assert got == _union_find(BAIL_LOLLIPOP)


def test_resolve_clusters_hub_star_bails_and_resolves(spark):
    # a 200-spoke hub star fed by a chain: the tail gear engages on the
    # chain crawl, converges it driver-side, then the hub's spokes blow
    # the candidate set (spokes all carry the hub's id as label) -> bail
    # -> distributed rounds finish. Exactly the adversarial-hub shape
    # SCALING.md's driver-tail bound is about.
    hub = 100
    spokes = [(hub, 200_000 + i) for i in range(200)]
    chain = [(0, 300_000)] + [
        (300_000 + i, 300_001 + i) for i in range(30)
    ] + [(300_030, hub)]
    edges = spokes + chain
    events: list = []
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.cluster_id
        for r in DD.resolve_clusters(
            pairs,
            max_iter=80,
            jump_from=2,
            frontier_threshold=50,
            debug_events=events,
        ).collect()
    }
    assert got == _union_find(edges)
    assert all(v == 0 for v in got.values())  # one component, min id 0
    assert "tail_engage" in events
    assert "tail_bail" in events


def test_numpy_topk_string_ids(spark):
    # generic-id contract now consistent with embedding_near_duplicates
    df = spark.createDataFrame(
        _vec_rows(), "vec_id string, embedding array<double>"
    )
    got = SIM.numpy_topk(df, df, k=1).collect()
    assert all(isinstance(r["query_id"], str) for r in got)
    by_q = {r["query_id"]: r["neighbor_id"] for r in got}
    assert by_q["doc-a"] == "doc-b" and by_q["doc-b"] == "doc-a"


def test_exact_canonical_null_text_grouping(spark):
    # pinned divergence: window form groups NULL fingerprints; the
    # min-id null-text doc is its own canonical (survives), the other
    # null-text docs are its duplicates
    from azuredataengineering_deeplearning_spark.operators import dedup as DD

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["canonical_id"]
        for r in DD.exact_canonical(df, "doc_id", "text").collect()
    }
    assert got == {1: 1, 2: 2, 3: 1}


def test_numpy_topk_mixed_id_types(spark):
    # query_id follows the QUERIES frame's id type, neighbor_id the
    # corpus frame's — the two may differ
    corpus = spark.createDataFrame(
        [(i, v) for i, (_, v) in enumerate(_vec_rows())],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        _vec_rows()[:2], "vec_id string, embedding array<double>"
    )
    got = SIM.numpy_topk(corpus, queries, k=1).collect()
    assert all(isinstance(r["query_id"], str) for r in got)
    assert all(isinstance(r["neighbor_id"], int) for r in got)
