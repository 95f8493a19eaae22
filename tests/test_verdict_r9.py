"""Pins for the round-9 VERDICT "next round" items.

#5 — dedup cache auto-release: ``dedup.cache_scope()`` releases every
sketch/signature frame persisted inside the block, and the curate
pipeline (which now uses it) holds zero tracked caches after its
result materializes.
"""

import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.operators import dedup as DD


def test_cache_scope_releases_inner_caches_only(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    before = DD.tracked_cache_count()
    outer = DD._persist_tracked(spark.range(5).toDF("x"))
    with DD.cache_scope():
        pairs = DD.minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
        pairs.count()  # materialize inside the scope
        assert DD.tracked_cache_count() > before + 1  # sketches tracked
    # inner caches released; the pre-existing one survives (nesting-safe)
    assert DD.tracked_cache_count() == before + 1
    assert outer.storageLevel.useMemory  # untouched by the scope
    DD.unpersist_caches()
    assert DD.tracked_cache_count() == 0


def test_cache_scope_releases_on_error(spark):
    before = DD.tracked_cache_count()
    with pytest.raises(RuntimeError, match="boom"):
        with DD.cache_scope():
            DD._persist_tracked(spark.range(3).toDF("x"))
            raise RuntimeError("boom")
    assert DD.tracked_cache_count() == before


def test_curate_pipeline_holds_no_tracked_caches(spark, sf_dir):
    from azuredataengineering_deeplearning_spark.catalog.pipelines import (
        pipeline_curate_corpus,
    )

    DD.unpersist_caches()
    out = pipeline_curate_corpus(spark, sf_dir)
    n = out.count()  # materialize the full pipeline
    assert n >= 0
    assert DD.tracked_cache_count() == 0
    # result is still correct after the release (recompute-from-lineage
    # safety): re-count agrees
    assert out.count() == n


def test_paragraph_dedup_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "HEADER\n\nunique one\n\nFOOTER"),
            (2, "HEADER\n\nunique two\n\nFOOTER"),
            (3, "header\n\nunique three"),  # case-insensitive dup
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_deduped"])
        for r in DD.paragraph_dedup(df, "doc_id", "text").collect()
    }
    assert rows[1] == (3, 3, "HEADER\n\nunique one\n\nFOOTER")
    assert rows[2] == (3, 1, "unique two")
    assert rows[3] == (2, 1, "unique three")


def test_paragraph_dedup_short_paragraphs_kept(spark):
    df = spark.createDataFrame(
        [(1, "Yes.\n\nlong paragraph"), (2, "Yes.\n\nother text")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["text_deduped"]
        for r in DD.paragraph_dedup(
            df, "doc_id", "text", min_chars=10
        ).collect()
    }
    # "Yes." is under min_chars -> kept verbatim in BOTH docs
    assert rows[1] == "Yes.\n\nlong paragraph"
    assert rows[2] == "Yes.\n\nother text"


def test_paragraph_dedup_regex_separator_is_literal(spark):
    df = spark.createDataFrame([(1, "a. b. a. c")], "doc_id long, text string")
    r = DD.paragraph_dedup(df, "doc_id", "text", sep=". ").collect()[0]
    # '. ' must split literally (F.split takes a regex; '.' would match
    # any char) — 4 units, the repeated 'a' deduped
    assert r["n_paras"] == 4 and r["n_kept"] == 3
    assert r["text_deduped"] == "a. b. c"
