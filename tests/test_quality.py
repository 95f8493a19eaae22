import pytest

from azuredataengineering_deeplearning_spark.operators import quality as Q


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (2, None, -5.0),
            (4, "zz", 999.0),
        ],
        "k long, s string, v double",
    )


def test_run_checks_one_row_per_constraint_in_order(spark, dirty):
    out = Q.run_checks(
        dirty,
        [
            Q.Check("s_not_null", "not_null", "s", min_frac=1.0),
            Q.Check("k_unique", "unique", "k"),
            Q.Check("v_range", "in_range", "v", lo=0, hi=100, min_frac=0.9),
            Q.Check("enough", "min_rows", threshold=3),
        ],
    ).orderBy("rank").collect()
    assert [r.name for r in out] == ["s_not_null", "k_unique", "v_range", "enough"]
    byname = {r.name: r for r in out}
    assert byname["s_not_null"].metric == 0.75 and not byname["s_not_null"].passed
    assert not byname["k_unique"].passed  # k=2 duplicated
    assert byname["v_range"].metric == 0.5 and not byname["v_range"].passed
    assert byname["enough"].metric == 4.0 and byname["enough"].passed


def test_run_checks_all_green_on_clean_data(spark):
    clean = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    out = Q.run_checks(
        clean,
        [
            Q.Check("nn", "not_null", "s"),
            Q.Check("uq", "unique", "k"),
            Q.Check("set", "in_set", "s", values=("x", "y")),
            Q.Check("re", "matches_regex", "s", pattern="^[xy]$"),
        ],
    ).collect()
    assert all(r.passed for r in out)
    assert all(r.metric == 1.0 for r in out)


def test_ref_integrity_counts_nulls_as_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (None,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,)], "pk int")
    (r,) = Q.check_referential_integrity(fact, "fk", dim, "pk").collect()
    assert not r.passed
    assert abs(r.metric - 2 / 3) < 1e-12


def test_ref_integrity_green(spark):
    fact = spark.createDataFrame([(1,), (2,), (2,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    (r,) = Q.check_referential_integrity(fact, "fk", dim, "pk").collect()
    assert r.passed and r.metric == 1.0


def test_benford_profile_on_benford_like_vs_uniform(spark):
    import math

    # powers-law-ish data follows Benford; uniform integers 1..9 x k do not
    benfordish = spark.range(1, 3000).selectExpr("CAST(POWER(1.01, id) AS DOUBLE) AS v")
    out = Q.benford_profile(benfordish, "v").collect()
    assert len(out) == 9
    total_chi = sum(r.chi2_term for r in out)
    assert total_chi < 30  # close to Benford
    for r in out:
        assert abs(r.expected_frac - math.log10(1 + 1 / r.digit)) < 1e-12
    uniform = spark.range(9000).selectExpr("CAST(id % 9 + 1 AS DOUBLE) AS v")
    chi_u = sum(r.chi2_term for r in Q.benford_profile(uniform, "v").collect())
    assert chi_u > 100  # uniform digits wildly violate Benford


def test_observed_write_single_pass_metrics(spark, tmp_path):
    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark.operators.quality import (
        observed_write,
    )

    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    out = str(tmp_path / "observed")
    got = observed_write(
        df, out,
        {"n": F.count(F.lit(1)),
         "null_v": F.sum(F.col("v").isNull().cast("int")),
         "sum_k": F.sum("k")},
    )
    assert got["n"] == 100 and got["null_v"] == 10
    assert got["sum_k"] == sum(range(100))
    assert spark.read.parquet(out).count() == 100


def test_chunk_text_overlap_reconstruction(spark):
    """Dropping each chunk's first `overlap` tokens (except chunk 0)
    and concatenating reproduces the document exactly — the window
    arithmetic loses nothing and duplicates only the overlap."""
    from azuredataengineering_deeplearning_spark.operators import text as TX

    docs = [
        (1, " ".join(f"t{i}" for i in range(100))),   # multi-chunk
        (2, " ".join(f"t{i}" for i in range(33))),    # one partial
        (3, " ".join(f"t{i}" for i in range(32))),    # exactly one
        (4, " ".join(f"t{i}" for i in range(5))),     # shorter than win
        (5, "solo"),                                  # single token
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = TX.chunk_text_overlap(
        df, "doc_id", "text", size=32, overlap=8
    ).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in docs:
        rows = by_doc[doc_id]
        assert rows[0]["chunk_idx"] == 0
        toks = []
        for r in rows:
            ct = r["chunk"].split(" ")
            assert len(ct) <= 32
            toks.extend(ct if r["chunk_idx"] == 0 else ct[8:])
            # consecutive full chunks share the 8-token overlap verbatim
            if r["chunk_idx"] > 0:
                prev = rows[r["chunk_idx"] - 1]["chunk"].split(" ")
                assert prev[-8:] == ct[:8] or len(prev) < 32
        assert " ".join(toks) == text, doc_id


def test_chunk_text_overlap_validation(spark):
    from azuredataengineering_deeplearning_spark.operators import text as TX

    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="overlap"):
        TX.chunk_text_overlap(df, "doc_id", "text", size=8, overlap=8)
