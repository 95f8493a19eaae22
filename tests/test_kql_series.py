"""KQL round-8 surface: partition by, evaluate pivot, series_* scalar
functions (fit line / stats / fill). The catalog rows cover the
oracle-checked happy paths; these tests pin edge semantics the oracles
can't reach (empty/single-element/all-null series, unsupported stages,
numpy parity on irregular data)."""

import math

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators.timeseries import (
    series_fill_linear,
    series_fit_line,
)
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _arr_df(spark, rows):
    return spark.createDataFrame(rows, "id long, y array<double>")


# ---------------------------------------------------------------------------
# series_fit_line_dynamic
# ---------------------------------------------------------------------------


def test_fit_line_exact_line(spark):
    df = _arr_df(spark, [(1, [3.0, 5.0, 7.0, 9.0])])
    (r,) = kql_to_df(
        {"T": df}, "T | extend f = series_fit_line_dynamic(y)"
    ).collect()
    f = r["f"]
    assert f["slope"] == pytest.approx(2.0)
    assert f["interception"] == pytest.approx(3.0)
    assert f["rsquare"] == pytest.approx(1.0)
    assert f["rvariance"] == pytest.approx(0.0)
    assert f["line_fit"] == pytest.approx([3.0, 5.0, 7.0, 9.0])


def test_fit_line_matches_numpy(spark):
    np = pytest.importorskip("numpy")
    ys = [1.0, 4.0, 2.0, 8.0, 5.0, 7.0, 3.0]
    df = _arr_df(spark, [(1, ys)])
    (r,) = kql_to_df(
        {"T": df}, "T | extend f = series_fit_line_dynamic(y)"
    ).collect()
    slope, intercept = np.polyfit(range(len(ys)), ys, 1)
    assert r["f"]["slope"] == pytest.approx(slope)
    assert r["f"]["interception"] == pytest.approx(intercept)
    resid = [y - (intercept + slope * i) for i, y in enumerate(ys)]
    assert r["f"]["rvariance"] == pytest.approx(
        sum(v * v for v in resid) / len(ys)
    )


@pytest.mark.parametrize(
    "ys,slope,b,r2",
    [
        ([5.0], 0.0, 5.0, 1.0),  # single point: flat fit, perfect r2
        ([2.0, 2.0, 2.0], 0.0, 2.0, 1.0),  # constant: variance 0 -> r2 1
    ],
)
def test_fit_line_degenerate(spark, ys, slope, b, r2):
    df = _arr_df(spark, [(1, ys)])
    (r,) = kql_to_df(
        {"T": df}, "T | extend f = series_fit_line_dynamic(y)"
    ).collect()
    assert r["f"]["slope"] == pytest.approx(slope)
    assert r["f"]["interception"] == pytest.approx(b)
    assert r["f"]["rsquare"] == pytest.approx(r2)


def test_fit_line_empty_is_null(spark):
    df = _arr_df(spark, [(1, [])])
    (r,) = kql_to_df(
        {"T": df}, "T | extend f = series_fit_line_dynamic(y)"
    ).collect()
    assert r["f"] is None


# ---------------------------------------------------------------------------
# series_stats_dynamic
# ---------------------------------------------------------------------------


def test_stats_dynamic_known_values(spark):
    df = _arr_df(spark, [(1, [3.0, 1.0, 4.0, 1.0, 5.0])])
    (r,) = kql_to_df(
        {"T": df}, "T | extend s = series_stats_dynamic(y)"
    ).collect()
    s = r["s"]
    assert (s["min"], s["max"]) == (1.0, 5.0)
    assert (s["min_idx"], s["max_idx"]) == (1, 4)  # FIRST index of the min
    assert s["avg"] == pytest.approx(2.8)
    assert s["sum"] == pytest.approx(14.0)
    assert s["len"] == 5
    # sample variance: (9+1+16+1+25 - 196/5) / 4 = 3.2
    assert s["variance"] == pytest.approx(3.2)
    assert s["stdev"] == pytest.approx(math.sqrt(3.2))


def test_stats_dynamic_single_and_empty(spark):
    df = _arr_df(spark, [(1, [7.0]), (2, [])])
    got = {
        r["id"]: r["s"]
        for r in kql_to_df(
            {"T": df}, "T | extend s = series_stats_dynamic(y)"
        ).collect()
    }
    assert got[2] is None
    assert got[1]["variance"] == 0.0 and got[1]["stdev"] == 0.0
    assert got[1]["len"] == 1 and got[1]["sum"] == 7.0


# ---------------------------------------------------------------------------
# series_fill_linear / series_fill_const
# ---------------------------------------------------------------------------


def test_fill_linear_interior_and_edges(spark):
    df = _arr_df(spark, [(1, [None, 1.0, None, None, 4.0, None])])
    (r,) = kql_to_df(
        {"T": df}, "T | extend z = series_fill_linear(y)"
    ).collect()
    assert r["z"] == pytest.approx([1.0, 1.0, 2.0, 3.0, 4.0, 4.0])


def test_fill_linear_all_null_stays_null(spark):
    df = _arr_df(spark, [(1, [None, None])])
    (r,) = kql_to_df(
        {"T": df}, "T | extend z = series_fill_linear(y)"
    ).collect()
    assert r["z"] == [None, None]


def test_fill_linear_no_nulls_identity_and_empty(spark):
    df = _arr_df(spark, [(1, [2.0, 9.0]), (2, [])])
    got = {
        r["id"]: r["z"]
        for r in kql_to_df(
            {"T": df}, "T | extend z = series_fill_linear(y)"
        ).collect()
    }
    assert got[1] == [2.0, 9.0]
    assert got[2] == []


def test_fill_const_and_nesting(spark):
    df = _arr_df(spark, [(1, [None, 3.0])])
    (r,) = kql_to_df(
        {"T": df},
        "T | extend a = series_fill_const(y, -1.0), "
        "b = series_fill_const(series_fill_linear(y), -1.0)",
    ).collect()
    assert r["a"] == [-1.0, 3.0]
    assert r["b"] == [3.0, 3.0]  # linear edge-fill wins before const


def test_make_series_default_null_marks_gaps(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 4.0),
        (2, "2024-01-03 10:00:00", 6.0),
    ]
    df = spark.createDataFrame(rows, "id long, t string, v double").withColumn(
        "t", F.to_timestamp("t")
    )
    out = kql_to_df(
        {"T": df},
        "T | make-series s=sum(v) default=null on t "
        "from datetime(2024-01-01) to datetime(2024-01-04) step 1d",
    )
    (r,) = out.collect()
    assert r["s"] == [4.0, None, 6.0]


# ---------------------------------------------------------------------------
# partition by
# ---------------------------------------------------------------------------


def _evt(spark):
    rows = [
        (1, "a", 10.0), (2, "a", 20.0), (3, "a", 5.0),
        (4, "b", 7.0), (5, "b", 9.0), (6, "c", 1.0),
    ]
    return spark.createDataFrame(rows, "id long, k string, v double")


def test_partition_top_per_value(spark):
    got = kql_to_df(
        {"E": _evt(spark)}, "E | partition by k (top 2 by v desc)"
    ).collect()
    assert sorted(r["id"] for r in got) == [1, 2, 4, 5, 6]


def test_partition_where_summarize(spark):
    got = {
        (r["k"], r["n"])
        for r in kql_to_df(
            {"E": _evt(spark)},
            "E | partition by k (where v > 5 | summarize n = count())",
        ).collect()
    }
    assert got == {("a", 2), ("b", 2)}  # k=c filtered away entirely


def test_partition_summarize_extra_keys_and_hint(spark):
    out = kql_to_df(
        {"E": _evt(spark)},
        "E | partition hint.strategy=native by k "
        "(extend hi = v > 8 | summarize n = count() by hi)",
    )
    got = {(r["k"], r["hi"], r["n"]) for r in out.collect()}
    assert got == {
        ("a", True, 2), ("a", False, 1),
        ("b", False, 1), ("b", True, 1),
        ("c", False, 1),
    }


def test_partition_unknown_column_and_stage_raise(spark):
    with pytest.raises(ValueError, match="partition column"):
        kql_to_df({"E": _evt(spark)}, "E | partition by nope (top 1 by v)")
    with pytest.raises(ValueError, match="unsupported stage"):
        kql_to_df({"E": _evt(spark)}, "E | partition by k (sort by v)")


# ---------------------------------------------------------------------------
# evaluate pivot
# ---------------------------------------------------------------------------


def test_pivot_count_fills_zero(spark):
    out = kql_to_df(
        {"E": _evt(spark)},
        "E | project bucket = id % 2, k | evaluate pivot(k)",
    )
    got = {r["bucket"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
    assert got == {0: (1, 1, 1), 1: (2, 1, 0)}


def test_pivot_sum_keeps_null_cells(spark):
    out = kql_to_df(
        {"E": _evt(spark)}, "E | evaluate pivot(k, sum(v), id)"
    )
    row = {r["id"]: r for r in out.collect()}
    assert row[1]["a"] == 10.0 and row[1]["b"] is None
    assert set(out.columns) == {"id", "a", "b", "c"}


def test_pivot_rejects_unknown_plugin_and_agg(spark):
    # narrow()/autocluster() became supported plugins in r9/r10 — use
    # a real unknown
    with pytest.raises(ValueError, match="evaluate plugin"):
        kql_to_df({"E": _evt(spark)}, "E | evaluate frobnicate()")
    with pytest.raises(ValueError, match="pivot aggregate"):
        kql_to_df({"E": _evt(spark)}, "E | evaluate pivot(k, median(v))")


# ---------------------------------------------------------------------------
# operator twins
# ---------------------------------------------------------------------------


def test_operator_twins_match_translator(spark):
    df = _arr_df(spark, [(1, [None, 1.0, None, 5.0])])
    op = series_fill_linear(df, "y", out="z").collect()[0]["z"]
    kq = kql_to_df({"T": df}, "T | extend z = series_fill_linear(y)").collect()[
        0
    ]["z"]
    assert op == kq
    fit = series_fit_line(
        _arr_df(spark, [(1, [1.0, 2.0, 3.0])]), "y"
    ).collect()[0]["fit"]
    assert fit["slope"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# evaluate bag_unpack
# ---------------------------------------------------------------------------


def test_bag_unpack_multi_key_union_of_schemas(spark):
    rows = [
        (1, '{"a": 1, "b": "x"}'),
        (2, '{"b": "y", "c": 2.5}'),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, bag string")
    out = kql_to_df({"T": df}, "T | evaluate bag_unpack(bag)")
    assert set(out.columns) == {"id", "a", "b", "c"}  # union of keys, bag gone
    got = {r["id"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
    assert got == {
        1: ("1", "x", None),
        2: (None, "y", "2.5"),
        3: (None, None, None),  # null bag survives with all-null keys
    }


def test_bag_unpack_prefix(spark):
    df = spark.createDataFrame([(1, '{"k": 7}')], "id long, bag string")
    out = kql_to_df({"T": df}, "T | evaluate bag_unpack(bag, 'p_')")
    assert set(out.columns) == {"id", "p_k"}
    assert out.collect()[0]["p_k"] == "7"


# ---------------------------------------------------------------------------
# row_cumsum / global_cumsum
# ---------------------------------------------------------------------------


def test_row_cumsum_requires_sort(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    with pytest.raises(ValueError, match="row_cumsum"):
        kql_to_df({"T": df}, "T | extend c = row_cumsum(v)")


def test_row_cumsum_desc_order_and_restart(spark):
    rows = [(1, 10.0, False), (2, 20.0, True), (3, 5.0, False)]
    df = spark.createDataFrame(rows, "id long, v double, r boolean")
    out = {
        x["id"]: (x["c"], x["cr"])
        for x in kql_to_df(
            {"T": df},
            "T | sort by id desc | extend c = row_cumsum(v), cr = row_cumsum(v, r)",
        ).collect()
    }
    # desc order: 3 -> 2 -> 1; restart at id=2 resets to 20, id=1 adds
    assert out[3] == (5.0, 5.0)
    assert out[2] == (25.0, 20.0)
    assert out[1] == (35.0, 30.0)


def test_global_cumsum_matches_single_window(spark):
    from azuredataengineering_deeplearning_spark.operators.windows import (
        global_cumsum,
    )
    from pyspark.sql import Window

    rows = [(i, float((i * 37) % 13) - 6.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(8)
    got = {
        r["id"]: r["c"]
        for r in global_cumsum(df, ["id"], "v", out="c").collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    assert all(abs(got[i] - want[i]) < 1e-9 for i in want)


# ---------------------------------------------------------------------------
# reference-query verbatim parity (daily_eval.py:147-159)
# ---------------------------------------------------------------------------


def test_reference_daily_eval_query_runs_verbatim(spark):
    """The reference's production Kusto query (set options + cluster/
    database addressing + project/where/ago/arg_max) must run through
    the translator UNCHANGED — only the cluster URL's table is bound
    locally."""
    rows = [
        # TicketId, Rev, CreatedDate, WorkEndDate, DeviceOperationalState,
        # State, ResolutionDetails, ResolutionsJson
        (1, 1, "2024-01-10", "2024-01-25", "Production", "Resolved", "fixed", "{}"),
        (1, 2, "2024-01-10", "2024-01-26", "Production", "Resolved", "refixed", "{}"),
        (2, 1, "2024-01-02", "2024-01-05", "Production", "Resolved", "old", "{}"),  # outside ago(14d)
        (3, 1, "2024-01-20", "2024-01-24", "Staging", "Resolved", "wrong env", "{}"),
        (4, 1, "2024-01-20", "2024-01-24", "Production", "Active", "not resolved", "{}"),
        (5, 1, "2024-01-20", "2024-01-24", "Production", "Resolved", "", "{}"),  # empty details
    ]
    df = spark.createDataFrame(
        rows,
        "TicketId long, Rev long, CreatedDate string, WorkEndDate string,"
        " DeviceOperationalState string, State string,"
        " ResolutionDetails string, ResolutionsJson string",
    ).withColumn("WorkEndDate", F.to_timestamp("WorkEndDate"))
    build_query = """
set maxmemoryconsumptionperiterator=68719476736;
set max_memory_consumption_per_query_per_node=68719476736;
set notruncation;
cluster('https://example.invalid').database('COIDG').TicketRevisions
| project TicketId, Rev, CreatedDate, WorkEndDate, DeviceOperationalState, State,
            ResolutionDetails, ResolutionsJson
| where State == 'Resolved'
| where DeviceOperationalState == 'Production'
| where WorkEndDate > ago(14d)
| where ResolutionDetails != ''
| summarize arg_max(Rev,*) by TicketId
"""
    out = kql_to_df(
        {"TicketRevisions": df}, build_query, now="2024-01-30 00:00:00"
    )
    got = {(r["TicketId"], r["Rev"]) for r in out.collect()}
    assert got == {(1, 2)}  # latest rev of the one surviving ticket


# ---------------------------------------------------------------------------
# series_pearson_correlation / series_decompose_anomalies
# ---------------------------------------------------------------------------


def test_pearson_matches_numpy_and_degenerates(spark):
    np = pytest.importorskip("numpy")
    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 4.1, 5.9, 8.0, 19.5]
    df = spark.createDataFrame(
        [(1, a, b), (2, [5.0, 5.0], [1.0, 2.0]), (3, [], [])],
        "id long, x array<double>, y array<double>",
    )
    got = {
        r["id"]: r["c"]
        for r in kql_to_df(
            {"T": df}, "T | extend c = series_pearson_correlation(x, y)"
        ).collect()
    }
    assert got[1] == pytest.approx(float(np.corrcoef(a, b)[0, 1]))
    assert got[2] == 0.0  # zero variance side -> 0, not NaN
    assert got[3] is None


def test_decompose_anomalies_flags_spike_and_dip(spark):
    ys = [10.0] * 20
    ys[7], ys[13] = 50.0, -30.0
    df = spark.createDataFrame([(1, ys)], "id long, y array<double>")
    (r,) = kql_to_df(
        {"T": df}, "T | extend d = series_decompose_anomalies(y, 1.5)"
    ).collect()
    d = r["d"]
    assert d["anomalies"][7] == 1 and d["anomalies"][13] == -1
    assert sum(1 for v in d["anomalies"] if v != 0) == 2
    assert len(d["baseline"]) == len(ys)
    # scores share the flags' sign at the flagged bins
    assert d["score"][7] > 0 and d["score"][13] < 0


def test_decompose_anomalies_constant_and_empty(spark):
    df = spark.createDataFrame(
        [(1, [5.0, 5.0, 5.0]), (2, [])], "id long, y array<double>"
    )
    got = {
        r["id"]: r["d"]
        for r in kql_to_df(
            {"T": df}, "T | extend d = series_decompose_anomalies(y)"
        ).collect()
    }
    assert got[2] is None
    assert got[1]["anomalies"] == [0, 0, 0]
    assert got[1]["score"] == [0.0, 0.0, 0.0]  # iqr 0 -> score 0, not NaN


def test_decompose_anomalies_clean_trend_no_flags(spark):
    ys = [float(3 + 2 * i) for i in range(15)]
    df = spark.createDataFrame([(1, ys)], "id long, y array<double>")
    (r,) = kql_to_df(
        {"T": df}, "T | extend d = series_decompose_anomalies(y)"
    ).collect()
    assert all(v == 0 for v in r["d"]["anomalies"])
    assert r["d"]["baseline"] == pytest.approx(ys)


def test_series_functions_null_array_yields_null(spark):
    # SQL NULL series (not empty): every series function must emit NULL,
    # never a fabricated flat fit / zero stats
    df = spark.createDataFrame([(1, None)], "id long, y array<double>")
    (r,) = kql_to_df(
        {"T": df},
        "T | extend f = series_fit_line_dynamic(y), s = series_stats_dynamic(y),"
        " d = series_decompose_anomalies(y), z = series_fill_linear(y),"
        " c = series_fill_const(y, 0.0), p = series_pearson_correlation(y, y)",
    ).collect()
    assert r["f"] is None and r["s"] is None and r["d"] is None
    assert r["z"] is None and r["c"] is None and r["p"] is None


def test_global_cumsum_null_terms_and_null_restart_row(spark):
    from azuredataengineering_deeplearning_spark.operators.windows import (
        global_cumsum,
    )

    rows = [
        (1, 5.0, False),
        (2, None, False),   # null term: SUM semantics, cum carries 5.0
        (3, 2.0, False),
        (4, None, True),    # restart row with NULL term: segment prefix
                            # is everything before it (7.0), not NULL/0
        (5, 3.0, False),
        (6, 4.0, True),     # normal restart
    ]
    df = spark.createDataFrame(rows, "id long, v double, r boolean")
    got = {
        x["id"]: (x["c"], x["cr"])
        for x in (
            global_cumsum(df, ["id"], "v", out="c")
            .transform(
                lambda d: global_cumsum(d, ["id"], "v", out="cr", restart_col="r")
            )
            .collect()
        )
    }
    assert got[1] == (5.0, 5.0)
    assert got[2] == (5.0, 5.0)  # null adds nothing
    assert got[3] == (7.0, 7.0)
    assert got[4] == (7.0, 0.0)  # reset at a null-term row -> sum restarts empty
    assert got[5] == (10.0, 3.0)
    assert got[6] == (14.0, 4.0)


def test_global_cumsum_leading_null_restart_row(spark):
    from azuredataengineering_deeplearning_spark.operators.windows import (
        global_cumsum,
    )

    rows = [(1, None, True), (2, 2.0, False), (3, 1.0, False)]
    df = spark.createDataFrame(rows, "id long, v double, r boolean")
    got = {
        x["id"]: x["cr"]
        for x in global_cumsum(
            df, ["id"], "v", out="cr", restart_col="r"
        ).collect()
    }
    assert got[2] == 2.0 and got[3] == 3.0  # empty prefix, not NULL-poisoned


# ---------------------------------------------------------------------------
# mv-expand extensions + stdev/variance aggregates
# ---------------------------------------------------------------------------


def test_mv_expand_with_itemindex_and_typeof(spark):
    df = spark.createDataFrame(
        [(1, ["7", "8"]), (2, ["9"])], "id long, xs array<string>"
    )
    out = kql_to_df(
        {"T": df}, "T | mv-expand with_itemindex=pos xs to typeof(long)"
    )
    got = {(r["id"], r["pos"], r["xs"]) for r in out.collect()}
    assert got == {(1, 0, 7), (1, 1, 8), (2, 0, 9)}  # 0-based index, cast long
    assert dict(out.dtypes)["xs"] == "bigint"


def test_mv_expand_bare_still_works(spark):
    df = spark.createDataFrame([(1, [4, 5])], "id long, xs array<int>")
    out = kql_to_df({"T": df}, "T | mv-expand xs")
    assert sorted(r["xs"] for r in out.collect()) == [4, 5]


def test_summarize_stdev_variance_sample(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 4.0), ("a", 7.0), ("b", 2.0)], "k string, v double"
    )
    got = {
        r["k"]: (r["sd"], r["vr"])
        for r in kql_to_df(
            {"T": df}, "T | summarize sd = stdev(v), vr = variance(v) by k"
        ).collect()
    }
    assert got["a"][1] == pytest.approx(9.0)  # sample variance of 1,4,7
    assert got["a"][0] == pytest.approx(3.0)
    assert got["b"][1] is None  # n=1 -> sample variance undefined


# ---------------------------------------------------------------------------
# string-operator widening + true innerunique
# ---------------------------------------------------------------------------


def _strs(spark):
    return spark.createDataFrame(
        [("alpha beta",), ("the Alphabet",), ("x1.2.3.4y",), ("1.2.3.4 seen",)],
        "t string",
    )


def test_negated_and_cs_term_operators(spark):
    q = lambda s: sorted(
        r["t"] for r in kql_to_df({"E": _strs(spark)}, s).collect()
    )
    # !has: whole-term, case-insensitive, negated ('Alphabet' is NOT the
    # term 'alpha', so it survives)
    assert q("E | where t !has 'alpha'") == [
        "1.2.3.4 seen", "the Alphabet", "x1.2.3.4y",
    ]
    assert q("E | where t has_cs 'Alphabet'") == ["the Alphabet"]
    assert q("E | where t has_cs 'alphabet'") == []
    # regex passes through VERBATIM (no escaping of metachars)
    assert q("E | where t matches regex '^[a-z]+ b'") == ["alpha beta"]
    # negated LIKE forms keep the literal-term escaping ('.' stays a dot)
    assert q("E | where t !contains '1.2'") == ["alpha beta", "the Alphabet"]
    assert q("E | where t !startswith 'the'") == [
        "1.2.3.4 seen", "alpha beta", "x1.2.3.4y",
    ]
    assert q("E | where t !endswith 'seen'") == [
        "alpha beta", "the Alphabet", "x1.2.3.4y",
    ]


def test_innerunique_dedups_left_keys(spark):
    L = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k long, tag string")
    R = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 30.0)], "k long, v double")
    # default kind IS innerunique: one (deterministic-min) left row per
    # key, ALL right matches — 3 rows, always tag 'x' for k=1
    got = sorted(
        (r["k"], r["tag"], r["v"])
        for r in kql_to_df({"L": L, "R": R}, "L | join (R) on k").collect()
    )
    assert got == [(1, "x", 10.0), (1, "x", 20.0), (2, "z", 30.0)]
    # explicit inner keeps every pair
    assert len(
        kql_to_df({"L": L, "R": R}, "L | join kind=inner (R) on k").collect()
    ) == 5
    # $left/$right form dedups too
    got2 = sorted(
        (r["k"], r["tag"])
        for r in kql_to_df(
            {"L": L, "R": R}, "L | join (R) on $left.k == $right.k"
        ).collect()
    )
    assert got2 == [(1, "x"), (1, "x"), (2, "z")]


def test_scalar_extras_edges(spark):
    rows = [(1, "click"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "id long, et string")
    out = {
        r["id"]: r
        for r in kql_to_df(
            {"T": df},
            "T | extend e = isempty(et), ne = isnotempty(et),"
            " nn = isnotnull(et), nu = isnull(et),"
            " sub = substring(et, 1, 3), idx = indexof(et, 'ick'),"
            " rep = replace_string(et, 'ck', 'x')",
        ).collect()
    }
    assert (out[1]["e"], out[2]["e"], out[3]["e"]) == (False, True, True)
    assert (out[1]["ne"], out[2]["ne"], out[3]["ne"]) == (True, False, False)
    assert (out[3]["nn"], out[3]["nu"]) == (False, True)
    assert out[1]["sub"] == "lic"  # 0-based start
    assert out[1]["idx"] == 2 and out[2]["idx"] == -1  # 0-based, -1 absent
    assert out[1]["rep"] == "clix"


def test_datetime_diff_counts_boundaries(spark):
    df = spark.createDataFrame(
        [(1, "2023-12-31 23:59:59"), (2, "2024-01-01 00:00:01")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["id"]: (r["dd"], r["mm"], r["yy"])
        for r in kql_to_df(
            {"T": df},
            "T | extend dd = datetime_diff('day', datetime(2024-01-01), ts),"
            " mm = datetime_diff('month', datetime(2024-01-01), ts),"
            " yy = datetime_diff('year', datetime(2024-01-01), ts)",
        ).collect()
    }
    # one second apart across midnight = a FULL boundary in every unit
    assert out[1] == (1, 1, 1)
    assert out[2] == (0, 0, 0)


def test_bin_at_anchor_alignment(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-15 05:59:00"), (2, "2024-01-15 06:01:00")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        str(r["b"]): r["id"]
        for r in kql_to_df(
            {"T": df},
            "T | extend b = bin_at(ts, 1d, datetime(2024-01-01 06:00:00))",
        ).collect()
    }
    assert set(out) == {"2024-01-14 06:00:00", "2024-01-15 06:00:00"}


def test_series_moving_avg_causal_center_and_edges(spark):
    df = spark.createDataFrame(
        [(1, [2.0, 4.0, 6.0, 8.0]), (2, []), (3, None)],
        "id long, y array<double>",
    )
    got = {
        r["id"]: (r["c"], r["m"])
        for r in kql_to_df(
            {"T": df},
            "T | extend c = series_moving_avg(y, 3),"
            " m = series_moving_avg(y, 3, true)",
        ).collect()
    }
    # causal: partial head windows
    assert got[1][0] == pytest.approx([2.0, 3.0, 4.0, 6.0])
    # centered (back 1, fwd 1): partial at both edges
    assert got[1][1] == pytest.approx([3.0, 4.0, 6.0, 7.0])
    assert got[2] == ([], [])
    assert got[3] == (None, None)


def test_series_moving_avg_k1_identity_and_k_validation(spark):
    df = spark.createDataFrame([(1, [5.0, 7.0])], "id long, y array<double>")
    (r,) = kql_to_df(
        {"T": df}, "T | extend m = series_moving_avg(y, 1)"
    ).collect()
    assert r["m"] == [5.0, 7.0]
    with pytest.raises(ValueError, match="k >= 1"):
        kql_to_df({"T": df}, "T | extend m = series_moving_avg(y, 0)")


# ---------------------------------------------------------------------------
# print / datetime range / union withsource / sample
# ---------------------------------------------------------------------------


def test_print_source_one_row(spark):
    anchor = spark.createDataFrame([(1,)], "x long")  # session table
    out = kql_to_df(
        {"T": anchor}, "print a = 1 + 1, b = strcat('x', 'y'), c = 2.5"
    ).collect()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"], out[0]["c"]) == (2, "xy", 2.5)


def test_range_datetime_spine(spark):
    anchor = spark.createDataFrame([(1,)], "x long")
    out = kql_to_df(
        {"T": anchor},
        "range d from datetime(2024-01-01) to datetime(2024-01-04) step 1d",
    ).collect()
    days = sorted(str(r["d"])[:10] for r in out)
    # INCLUSIVE stop bound, like the numeric form
    assert days == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]


def test_union_withsource_labels_rows(spark):
    A = spark.createDataFrame([(1,)], "v long")
    B = spark.createDataFrame([(2,), (3,)], "v long")
    got = sorted(
        (r["Src"], r["v"])
        for r in kql_to_df(
            {"A": A, "B": B}, "A | union withsource=Src B"
        ).collect()
    )
    assert got == [("A", 1), ("B", 2), ("B", 3)]


def test_sample_deterministic_subset(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = sorted(r["id"] for r in kql_to_df({"T": df}, "T | sample 10").collect())
    b = sorted(r["id"] for r in kql_to_df({"T": df}, "T | sample 10").collect())
    assert a == b and len(a) == 10
    assert set(a) <= set(range(100))


def test_top_nested_with_others_levels(spark):
    rows = [
        ("a", "u1", 10.0), ("a", "u2", 5.0), ("b", "u1", 8.0),
        ("c", "u3", 2.0), ("d", "u4", 1.0),
    ]
    E = spark.createDataFrame(rows, "et string, u string, v double")
    one = {
        (r["et"], r["s"])
        for r in kql_to_df(
            {"E": E}, "E | top-nested 2 of et with others='Other' by s=sum(v)"
        ).collect()
    }
    assert one == {("a", 15.0), ("b", 8.0), ("Other", 3.0)}
    nested = {
        (r["et"], r["u"], r["sv"], r["s"])
        for r in kql_to_df(
            {"E": E},
            "E | top-nested 2 of et with others='OtherE' by s=sum(v),"
            " top-nested 1 of u with others='OtherU' by sv=sum(v)",
        ).collect()
    }
    assert nested == {
        ("a", "u1", 10.0, 15.0),
        ("b", "u1", 8.0, 8.0),
        ("a", "OtherU", 5.0, 15.0),   # per-branch others, parent agg kept
        ("OtherE", None, None, 3.0),  # level-1 others never descends
    }
    # branch b had only one user -> no OtherU row for it (pinned above
    # by exact set equality); others with avg recomputes from source
    avg = {
        (r["et"], round(r["m"], 6))
        for r in kql_to_df(
            {"E": E}, "E | top-nested 2 of et with others='O' by m=avg(v)"
        ).collect()
    }
    assert avg == {("a", 7.5), ("b", 8.0), ("O", 1.5)}  # avg(2,1), not avg of avgs
