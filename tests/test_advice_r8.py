"""Round-8 regression tests for the r7 ADVICE findings.

Each test pins a concrete failure mode found by the round-7 advisor:

1. ``mv-apply`` leaked the internal snapshot column into the output
   schema when an extend-overwritten record column was ALSO a summarize
   ``by`` key (the rename-back loop skipped the rename but still forgot
   the snapshot, so the final drop missed it).
2. ``mv-apply``: a record column dropped by ``project-away`` and
   recreated by a later ``extend`` re-entered the summarize group keys,
   fracturing the per-record aggregate into one row per distinct
   derived value (Kusto: a dropped record column is no longer record
   identity).
3. ``has_any`` silently regex-matched a bare identifier argument as the
   literal identifier TEXT instead of raising for unsupported syntax.
4. ``simhash_near_duplicates`` / ``minhash_near_duplicates`` persisted
   sketch frames with no release path, accumulating executor storage
   across calls in a long session.
"""

import pytest

from azuredataengineering_deeplearning_spark.operators import dedup as DD
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


# ---------------------------------------------------------------------------
# 1. mv-apply: snapshot column must never leak into the output schema
# ---------------------------------------------------------------------------


def _lang_table(spark):
    return spark.createDataFrame(
        [(1, "rec-x", ["a", "b", "a"]), (2, "rec-y", ["b"])],
        "id long, lang string, xs array<string>",
    )


def test_mv_apply_overwritten_by_key_no_snapshot_leak(spark):
    T = _lang_table(spark)
    out = kql_to_df(
        {"T": T},
        "T | mv-apply xs on (extend lang = tostring(xs) "
        "| summarize n = count() by lang)",
    )
    assert not [c for c in out.columns if c.startswith("__mvap")], out.columns
    assert set(out.columns) == {"id", "lang", "n"}
    got = {(r["id"], r["lang"], r["n"]) for r in out.collect()}
    # per-record, per-element-lang counts; output lang is the per-element
    # value (the extend overwrote it and the summarize grouped by it)
    assert got == {(1, "a", 2), (1, "b", 1), (2, "b", 1)}


def test_mv_apply_overwritten_not_by_key_still_restored(spark):
    # the companion path (snapshot renamed back) must keep working: lang
    # overwritten but NOT a by key -> output lang is the ORIGINAL record
    # value, one aggregate row per record
    T = _lang_table(spark)
    out = kql_to_df(
        {"T": T},
        "T | mv-apply xs on (extend lang = tostring(xs) "
        "| summarize n = count())",
    )
    assert not [c for c in out.columns if c.startswith("__mvap")], out.columns
    got = {(r["id"], r["lang"], r["n"]) for r in out.collect()}
    assert got == {(1, "rec-x", 3), (2, "rec-y", 1)}


# ---------------------------------------------------------------------------
# 2. mv-apply: project-away removes the column from record identity
# ---------------------------------------------------------------------------


def test_mv_apply_project_away_then_extend_recreate(spark):
    T = spark.createDataFrame(
        [(1, 99, [10, 20, 20]), (2, 77, [5])],
        "id long, c long, xs array<long>",
    )
    out = kql_to_df(
        {"T": T},
        "T | mv-apply xs on (project-away c | extend c = xs * 10 "
        "| summarize n = count(), mx = max(c))",
    )
    # the recreated c is per-element derived, NOT a group key: exactly
    # one aggregate row per original record (pre-fix: one row per
    # distinct derived value, 2 rows for id=1)
    got = {(r["id"], r["n"], r["mx"]) for r in out.collect()}
    assert got == {(1, 3, 200), (2, 1, 50)}
    assert not [c for c in out.columns if c.startswith("__mvap")], out.columns


def test_mv_apply_project_away_drops_for_good(spark):
    T = spark.createDataFrame(
        [(1, 99, [10, 20])], "id long, c long, xs array<long>"
    )
    out = kql_to_df(
        {"T": T}, "T | mv-apply xs on (project-away c | summarize n = count())"
    )
    assert "c" not in out.columns
    assert {(r["id"], r["n"]) for r in out.collect()} == {(1, 2)}


# ---------------------------------------------------------------------------
# 3. has_any rejects non-literal arguments
# ---------------------------------------------------------------------------


def test_has_any_rejects_bare_identifier(spark):
    E = spark.createDataFrame(
        [("the allowlist word",), ("clean",)], "t string"
    )
    with pytest.raises(ValueError, match="has_any.*literal"):
        kql_to_df({"E": E}, "E | where t has_any (allowlist)").collect()


def test_has_any_rejects_mixed_literal_and_identifier(spark):
    E = spark.createDataFrame([("alpha",)], "t string")
    with pytest.raises(ValueError, match="has_any"):
        kql_to_df({"E": E}, "E | where t has_any ('alpha', terms)").collect()


def test_has_any_literals_still_work(spark):
    E = spark.createDataFrame(
        [("alpha beta",), ("gamma",), ("delta x",)], "t string"
    )
    got = {
        r["t"]
        for r in kql_to_df(
            {"E": E}, "E | where t has_any ('alpha', 'delta')"
        ).collect()
    }
    assert got == {"alpha beta", "delta x"}


# ---------------------------------------------------------------------------
# 4. dedup sketch caches are releasable
# ---------------------------------------------------------------------------


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark shuffles and joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unpersist_caches_releases_simhash_sketch(spark):
    DD.unpersist_caches()  # drain anything a prior test pinned
    DD.simhash_near_duplicates(_docs(spark), "doc_id", "text", max_hamming=8).count()
    released = DD.unpersist_caches()
    assert released >= 1
    assert DD.unpersist_caches() == 0  # registry drained, idempotent


def test_unpersist_caches_releases_minhash_frames(spark):
    DD.unpersist_caches()
    DD.minhash_near_duplicates(
        _docs(spark), "doc_id", "text", threshold=0.5
    ).count()
    # shingle frame + signature frame both registered
    assert DD.unpersist_caches() >= 2
    assert DD.unpersist_caches() == 0


def test_unpersist_caches_result_recomputable_after_release(spark):
    # a released frame must recompute from lineage if the pair frame is
    # re-materialized after the release
    DD.unpersist_caches()
    pairs = DD.simhash_near_duplicates(
        _docs(spark), "doc_id", "text", max_hamming=8
    )
    before = pairs.count()
    DD.unpersist_caches(blocking=True)
    assert pairs.count() == before
