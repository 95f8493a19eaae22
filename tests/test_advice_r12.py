"""Regression pins for the round-12 ADVICE items.

1. medium — scan declare 'set' variables must not conflate a
   NULL-VALUED assignment with 'no assignment': `t0 = nullable_col`
   on a row where the column is null must set the variable to null
   (Kusto's sequential machine), not silently keep the previous
   value/default. Fixed by wrapping the assigned value in a struct
   that is non-null exactly on assignment rows.
2. low — row_rank_dense/min with a NESTED call argument
   (row_rank_dense(tolower(t))) must resolve via the paren-balanced
   extractor instead of falling through to an opaque Spark
   'undefined function' AnalysisException; a leftover row_rank_*
   token raises a descriptive ValueError.
3. low — sibling assignments in ONE extend stage sharing a Term
   (`extend d = row_rank_dense(T), m = row_rank_min(T)`) share ONE
   global_run_ranks kernel pass (one bounds sketch + one stats
   collect), not one per assignment.
4. low — kql_fork must raise a clean ValueError on an empty pipe
   stage (doubled or trailing '|'), not an IndexError from
   `s.split(None, 1)[0]`.
5. low — global_run_ranks bucket-boundary term comparison must match
   Spark's eqNullSafe NaN semantics (NaN == NaN): a float-NaN run
   spanning a bucket boundary gets NO spurious dense-rank increment
   and the row_rank_min carry stays at the run's first row.
"""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators.windows import (
    global_run_ranks,
)
from azuredataengineering_deeplearning_spark.sources.kql import (
    kql_fork,
    kql_to_df,
)


# ---- 1 (medium): scan declare set var NULL-valued assignment ---------

def test_scan_declare_set_null_assignment_sets_null(spark):
    rows = [
        (1, "A", 10.0),   # match 0: t0 = 10.0
        (2, "B", 99.0),
        (3, "A", None),   # match 1: t0 = NULL (NOT "keep previous")
        (4, "B", 99.0),
    ]
    df = spark.createDataFrame(rows, "seq int, ev string, v double")
    out = kql_to_df(
        {"T": df},
        "T | sort by seq asc | scan with_match_id=m"
        " declare (t0: real = -1) with ("
        " step s1: ev == 'A' => t0 = v;"
        " step s2: ev == 'B')",
    )
    got = {r["seq"]: r["t0"] for r in out.collect()}
    # seq 3 assigned a NULL value: the variable IS null from that row
    # on (Kusto sequential semantics), not the default -1 and not a
    # carried-over 10.0
    assert got == {1: 10.0, 2: 10.0, 3: None, 4: None}


def test_scan_declare_set_null_then_reassigned(spark):
    rows = [
        (1, "A", None),  # s1: t0 = NULL
        (2, "B", 5.0),   # s2: t0 = 5.0 (recovers within the same match)
        (3, "C", 9.0),
    ]
    df = spark.createDataFrame(rows, "seq int, ev string, v double")
    out = kql_to_df(
        {"T": df},
        "T | sort by seq asc | scan with_match_id=m"
        " declare (t0: real = -1) with ("
        " step s1: ev == 'A' => t0 = v;"
        " step s2: ev == 'B' => t0 = v;"
        " step s3: ev == 'C')",
    )
    got = {r["seq"]: r["t0"] for r in out.collect()}
    assert got == {1: None, 2: 5.0, 3: 5.0}


# ---- 2 (low): nested row_rank argument + loud leftover ---------------

def test_row_rank_nested_call_argument(spark):
    df = spark.createDataFrame(
        [(1, "A"), (2, "a"), (3, "B"), (4, "b")], "i int, t string"
    )
    out = kql_to_df(
        {"T": df},
        "T | sort by i asc | extend d = row_rank_dense(tolower(t))",
    )
    rows = sorted((r["i"], r["d"]) for r in out.collect())
    # tolower collapses A/a and B/b into two consecutive runs
    assert rows == [(1, 1), (2, 1), (3, 2), (4, 2)]


def test_row_rank_unknown_variant_raises_loud(spark):
    df = spark.createDataFrame([(1, "a")], "i int, t string")
    with pytest.raises(ValueError, match="row_rank"):
        kql_to_df(
            {"T": df},
            "T | sort by i asc | extend d = row_rank_avg(t)",
        )


# ---- 3 (low): sibling assignments share one kernel pass --------------

def test_row_rank_sibling_assignments_single_kernel_pass(
    spark, monkeypatch
):
    import azuredataengineering_deeplearning_spark.operators.windows as W
    import azuredataengineering_deeplearning_spark.sources.kql as K

    calls = {"n": 0}
    real = W.global_run_ranks

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(W, "global_run_ranks", counting)
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "a")], "i int, t string"
    )
    out = kql_to_df(
        {"T": df},
        "T | sort by i asc"
        " | extend d = row_rank_dense(t), m = row_rank_min(t)",
    )
    rows = sorted((r["i"], r["d"], r["m"]) for r in out.collect())
    assert rows == [(1, 1, 1), (2, 1, 1), (3, 2, 3), (4, 3, 4)]
    # the WHOLE extend stage ran global_run_ranks exactly once for the
    # shared Term — the pre-r12 per-assignment path paid two passes
    # (two bounds sketches + two stats collects)
    assert calls["n"] == 1


# ---- 4 (low): fork empty pipe stage raises clean ValueError ----------

def test_fork_empty_stage_raises_value_error(spark):
    df = spark.createDataFrame([(1,)], "i int")
    for bad in (
        "T | fork (count) |",       # trailing '|'
        "T | | fork (count)",       # doubled '|'
    ):
        with pytest.raises(ValueError, match="empty pipe stage"):
            kql_fork({"T": df}, bad)


# ---- 5 (low): NaN run spanning a bucket boundary ---------------------

def test_run_ranks_nan_run_spans_bucket_boundary(spark):
    nan = float("nan")
    rows = [(i, nan) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "i int, t double").repartition(4)
    out = global_run_ranks(
        df, [F.col("i").asc()], "t",
        dense_out="d", min_out="m", num_partitions=4,
    )
    got = sorted((r["i"], r["d"], r["m"]) for r in out.collect())
    # ONE NaN run across every bucket boundary: dense stays 1, min
    # stays the first global row number (Spark eqNullSafe: NaN == NaN)
    assert got == [(i, 1, 1) for i in range(1, 9)]


def test_run_ranks_nan_vs_value_boundary_still_changes(spark):
    nan = float("nan")
    rows = [(1, nan), (2, nan), (3, 1.0), (4, 1.0), (5, nan), (6, nan)]
    df = spark.createDataFrame(rows, "i int, t double").repartition(3)
    out = global_run_ranks(
        df, [F.col("i").asc()], "t",
        dense_out="d", min_out="m", num_partitions=3,
    )
    got = sorted((r["i"], r["d"], r["m"]) for r in out.collect())
    # NaN→value and value→NaN ARE changes; the second NaN run is new
    assert got == [
        (1, 1, 1), (2, 1, 1), (3, 2, 3), (4, 2, 3), (5, 3, 5), (6, 3, 5),
    ]


def test_row_rank_term_sees_earlier_stage_assignment(spark):
    # left-to-right extend semantics: a rank term referencing a column
    # CREATED earlier in the same stage ranks the new column (the
    # stage-wide kernel hoist must fall back to sequential here)
    df = spark.createDataFrame(
        [(1, "A"), (2, "a"), (3, "B"), (4, "b")], "i int, t string"
    )
    out = kql_to_df(
        {"T": df},
        "T | sort by i asc"
        " | extend low = tolower(t), d = row_rank_dense(low)",
    )
    rows = sorted((r["i"], r["d"]) for r in out.collect())
    assert rows == [(1, 1), (2, 1), (3, 2), (4, 2)]


def test_row_rank_term_sees_same_stage_reassignment(spark):
    # a term whose column is REASSIGNED earlier in the stage ranks the
    # reassigned values, exactly like sequential Kusto extends
    df = spark.createDataFrame(
        [(1, "A"), (2, "a"), (3, "B"), (4, "b")], "i int, t string"
    )
    out = kql_to_df(
        {"T": df},
        "T | sort by i asc"
        " | extend t = tolower(t), d = row_rank_dense(t)",
    )
    rows = sorted((r["i"], r["d"]) for r in out.collect())
    assert rows == [(1, 1), (2, 1), (3, 2), (4, 2)]
