"""Round-10 verdict asks.

#1 — skew-hardened canonical-slot dedup: ``paragraph_dedup`` (default)
and ``exact_canonical(skew_safe=True)`` replace the one-task-per-
duplicate-group window with a decomposable groupBy(min) + equi-join
back (map-side combine bounds the hot key; AQE skew-join splits the
probe side). Pins: both paths produce IDENTICAL results, including the
null-text group and the all-duplicates corpus.
"""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators.dedup import (
    exact_canonical,
    paragraph_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    header = "COMMON HEADER"
    rows = [
        (i, f"{header}\n\nbody {i}\n\nshared {i % 3}\n\nCOMMON FOOTER")
        for i in range(20)
    ]
    rows.append((100, ""))  # empty doc -> one empty paragraph
    rows.append((101, header))  # doc that IS the boilerplate
    return spark.createDataFrame(rows, "doc_id int, text string")


def _pd_rows(docs, **kw):
    out = paragraph_dedup(docs, "doc_id", "text", min_chars=2, **kw)
    return sorted(
        (r["doc_id"], r["n_paras"], r["n_kept"], r["text_deduped"])
        for r in out.collect()
    )


def test_paragraph_dedup_skew_safe_equivalent(docs):
    assert _pd_rows(docs, skew_safe=True) == _pd_rows(docs, skew_safe=False)


def test_paragraph_dedup_skew_safe_semantics(docs):
    rows = {r[0]: r for r in _pd_rows(docs, skew_safe=True)}
    # doc 0 holds the canonical slot for header/footer/shared 0
    assert rows[0][3] == "COMMON HEADER\n\nbody 0\n\nshared 0\n\nCOMMON FOOTER"
    # doc 1 keeps only its unique body + shared 1's canonical slot
    assert rows[1][3] == "body 1\n\nshared 1"
    # doc 19: every non-body paragraph seen earlier
    assert rows[19][3] == "body 19"
    # doc 101 is pure boilerplate -> everything removed
    assert rows[101] == (101, 1, 0, "")
    # empty doc: 1 short paragraph kept verbatim (min_chars guard)
    assert rows[100] == (100, 1, 1, "")


def test_paragraph_dedup_all_duplicates_one_survivor(spark):
    # the extreme-skew shape: ONE paragraph in every document
    df = spark.range(500).select(
        F.col("id").cast("int").alias("doc_id"),
        F.lit("Same license text.").alias("text"),
    )
    out = paragraph_dedup(df, "doc_id", "text")
    kept = out.agg(F.sum("n_kept")).collect()[0][0]
    assert kept == 1
    survivor = out.filter(F.col("n_kept") == 1).collect()
    assert len(survivor) == 1 and survivor[0]["doc_id"] == 0


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame(
        [
            (1, "hello  world"),
            (2, "hello world"),  # same fingerprint as 1 (ws-normalized)
            (3, "unique"),
            (4, None),
            (5, None),
        ],
        "id int, t string",
    )


def _ec_rows(texts, **kw):
    out = exact_canonical(texts, "id", "t", **kw)
    return sorted((r["id"], r["canonical_id"]) for r in out.collect())


def test_exact_canonical_skew_safe_equivalent(texts):
    expected = [(1, 1), (2, 1), (3, 3), (4, 4), (5, 4)]
    assert _ec_rows(texts, skew_safe=False) == expected
    assert _ec_rows(texts, skew_safe=True) == expected


def test_exact_canonical_skew_safe_keeps_all_columns(texts):
    out = exact_canonical(texts, "id", "t", skew_safe=True)
    assert set(out.columns) == {"id", "t", "canonical_id"}
    assert out.count() == 5
