import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df
from azuredataengineering_deeplearning_spark.sources.readers import load_tables


@pytest.fixture(scope="module")
def events(spark):
    return load_tables(spark, "/root/testdata/sf0.01", ["events"])["events"].cache()


def test_kql_where_contains(spark, events):
    out = kql_to_df({"events": events}, "events | where event_type contains 'urch'")
    assert out.count() > 0
    assert out.filter(F.col("event_type") != "purchase").count() == 0


def test_kql_extend_and_rename(spark, events):
    out = kql_to_df(
        {"events": events},
        "events | extend v2 = value * 2 | project-rename uid = user_id | project uid, v2 | take 5",
    )
    assert out.columns == ["uid", "v2"]
    assert out.count() == 5


def test_kql_distinct_and_count(spark, events):
    n = kql_to_df({"events": events}, "events | distinct event_type | count").collect()[0].Count
    assert n == 5


def test_kql_top(spark, events):
    rows = kql_to_df({"events": events}, "events | top 3 by value desc").collect()
    vals = [r.value for r in rows]
    assert vals == sorted(vals, reverse=True) and len(vals) == 3


def test_kql_unknown_table_and_op(spark, events):
    with pytest.raises(ValueError):
        kql_to_df({"events": events}, "nope | take 5")
    with pytest.raises(ValueError):
        kql_to_df({"events": events}, "events | facet by foo")


def test_kusto_source_with_kql_executor(spark, events):
    from azuredataengineering_deeplearning_spark.sources.connectors import KustoSource

    src = KustoSource(
        "https://cluster", "db",
        executor=lambda q: kql_to_df({"events": events}, q),
    )
    out = src.read(spark, "events | summarize n=count() by event_type")
    assert out.count() == 5


# ---------------------------------------------------------------------------
# approx sketch paths (the 100 TB profiling switches) stay near exact
# ---------------------------------------------------------------------------


def test_approx_count_distinct_tolerance(spark, events):
    from azuredataengineering_deeplearning_spark.operators.aggregates import (
        count_distinct_all,
    )

    exact = count_distinct_all(events, ["user_id", "event_type"]).collect()[0]
    approx = count_distinct_all(events, ["user_id", "event_type"], approx=True).collect()[0]
    assert abs(approx["user_id"] - exact["user_id"]) / exact["user_id"] < 0.05
    assert abs(approx["event_type"] - exact["event_type"]) <= 1


def test_percentile_approx_tolerance(spark, events):
    from azuredataengineering_deeplearning_spark.operators.aggregates import percentiles

    exact = percentiles(events, "value", (0.5,)).collect()[0][0]
    approx = percentiles(events, "value", (0.5,), approx=True).collect()[0][0]
    assert abs(approx - exact) / max(abs(exact), 1e-9) < 0.05


def test_kql_ago_pinned_and_wallclock(spark, events):
    pinned = kql_to_df(
        {"events": events}, "events | where ts >= ago(1d)", now="2024-01-02 00:00:00"
    )
    # only events within [now-1d, ...] survive
    assert pinned.count() == events.filter("ts >= timestamp'2024-01-01 00:00:00'").count()
    # wall-clock form parses and runs (2024 data is all in the past → empty)
    assert kql_to_df({"events": events}, "events | where ts >= ago(1h)").count() == 0


def test_kql_bin_buckets_align_to_epoch(spark, events):
    out = kql_to_df(
        {"events": events},
        "events | summarize n=count() by h = bin(ts, 6h)",
    )
    rows = out.collect()
    assert sum(r.n for r in rows) == events.count()
    for r in rows:  # every bucket boundary is a multiple of 6h since epoch
        assert r.h.timestamp() % (6 * 3600) == 0


def test_kql_join_kinds(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    right = spark.createDataFrame([(1, "x"), (3, "y")], ["k", "w"])
    t = {"L": left, "R": right}
    inner = kql_to_df(t, "L | join kind=inner (R) on k")
    assert {r.k for r in inner.collect()} == {1, 3}
    anti = kql_to_df(t, "L | join kind=leftanti (R) on k")
    assert {r.k for r in anti.collect()} == {2}
    # $left/$right form with differing key names
    right2 = spark.createDataFrame([(1, "x")], ["rk", "w"])
    dollar = kql_to_df(
        {"L": left, "R2": right2},
        "L | join kind=inner (R2) on $left.k == $right.rk",
    )
    assert {r.k for r in dollar.collect()} == {1}


def test_kql_union_and_mv_expand(spark):
    a = spark.createDataFrame([(1, "p q")], ["id", "text"])
    b = spark.createDataFrame([(2, "r s")], ["id", "text"])
    u = kql_to_df({"A": a, "B": b}, "A | union (B)")
    assert u.count() == 2
    ex = kql_to_df(
        {"A": a},
        "A | extend tok = split(text, ' ') | mv-expand tok",
    )
    assert sorted(r.tok for r in ex.collect()) == ["p", "q"]


def test_kql_parse_and_project_away(spark):
    df = spark.createDataFrame(
        [("user=alice;region=us-west",), ("user=bob;region=eu",)], ["raw"]
    )
    out = kql_to_df(
        {"t": df},
        "t | parse raw with 'user=' user ';region=' region | project-away raw",
    )
    rows = {(r.user, r.region) for r in out.collect()}
    assert rows == {("alice", "us-west"), ("bob", "eu")}
    assert out.columns == ["user", "region"]


def test_kql_has_whole_term(spark):
    df = spark.createDataFrame(
        [("the spark engine",), ("sparkly things",), ("SPARK caps",)], ["msg"]
    )
    out = kql_to_df({"t": df}, "t | where msg has 'spark'")
    got = {r.msg for r in out.collect()}
    # whole-term, case-insensitive: 'sparkly' must NOT match
    assert got == {"the spark engine", "SPARK caps"}


def test_kql_countif_sumif_golden(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 60.0), ("b", 90.0)], ["k", "v"]
    )
    out = {r.k: r for r in kql_to_df(
        {"t": df},
        "t | summarize n=countif(v > 50), s=sumif(v, v > 50), p=percentile(v, 50) by k",
    ).collect()}
    assert out["a"].n == 1 and out["a"].s == 60.0
    assert out["b"].n == 1 and out["b"].s == 90.0
    assert out["a"].p == 35.0  # exact interpolated median of [10, 60]


def test_kql_scalar_function_translation(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame([("Widget", 7)], "name string, n int")
    out = kql_to_df(
        {"t": df},
        """
        t
        | extend lo = tolower(name), hi = toupper(name),
                 lab = iff(n > 5, strcat(name, '-big'), 'small'),
                 ln = strlen(name), s = tostring(n),
                 w = extract('([A-Z][a-z]+)', 1, name)
        """,
    ).collect()[0]
    assert (out["lo"], out["hi"]) == ("widget", "WIDGET")
    assert out["lab"] == "Widget-big" and out["ln"] == 6
    assert out["s"] == "7" and out["w"] == "Widget"


def test_kql_top_nested_hierarchy(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    rows = []
    # type A: 6 rows, type B: 4, type C: 1 -> top-2 keeps A, B
    for u, n in (("u1", 3), ("u2", 2), ("u3", 1)):
        rows += [("A", u, 10.0)] * n
    for u, n in (("u4", 3), ("u5", 1)):
        rows += [("B", u, 5.0)] * n
    rows += [("C", "u6", 99.0)]
    df = spark.createDataFrame(rows, "et string, u string, v double")
    out = kql_to_df(
        {"t": df},
        "t | top-nested 2 of et by n=count(), top-nested 2 of u by s=sum(v)",
    ).collect()
    got = sorted((r["et"], r["u"], r["s"], r["n"]) for r in out)
    assert got == [
        ("A", "u1", 30.0, 6), ("A", "u2", 20.0, 6),
        ("B", "u4", 15.0, 4), ("B", "u5", 5.0, 4),
    ]


def test_kql_range_source(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    anchor = spark.range(1)  # any session-bearing table
    out = kql_to_df(
        {"t": anchor},
        "range x from 1 to 10 step 3 | extend y = x * 2 | where y > 4",
    ).collect()
    assert sorted((r["x"], r["y"]) for r in out) == [(4, 8), (7, 14), (10, 20)]


def test_kql_getschema(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame([(1, "x")], "a int, b string")
    rows = {r["ColumnName"]: r["ColumnType"] for r in
            kql_to_df({"t": df}, "t | getschema").collect()}
    assert rows == {"a": "int", "b": "string"}


def test_kql_let_scalar_and_tabular(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame(
        [("A", 5.0), ("A", 15.0), ("B", 25.0)], "et string, v double"
    )
    out = kql_to_df(
        {"t": df},
        """
        let cutoff = 10.0;
        let big = t | where v > cutoff;
        big | summarize n = count() by et
        """,
    ).collect()
    assert sorted((r["et"], r["n"]) for r in out) == [("A", 1), ("B", 1)]


def test_kql_dynamic_access_and_case(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame(
        [('{"k": 7}',), ('{"k": 42}',)], "props string"
    )
    out = kql_to_df(
        {"t": df},
        "t | extend k = toint(todynamic(props).k)"
        " | extend band = case(k < 10, 'small', k < 100, 'mid', 'big')",
    ).collect()
    assert sorted((r["k"], r["band"]) for r in out) == [(7, "small"), (42, "mid")]


def test_kql_between_and_startofweek(spark):
    import datetime as dt

    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 6, 15, 30)),   # a Wednesday
         (9, dt.datetime(2024, 3, 10, 1, 0))],   # a Sunday
        "x long, ts timestamp",
    )
    out = kql_to_df(
        {"t": df},
        "t | where x between (0 .. 5) | extend w = startofweek(ts)",
    ).collect()
    assert len(out) == 1
    # KQL weeks start Sunday: Wed Mar 6 → Sun Mar 3
    assert out[0]["w"] == dt.datetime(2024, 3, 3, 0, 0)


def test_kql_serialized_window_funcs(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame(
        [("b", 2.0), ("a", 1.0), ("c", 4.0)], "k string, v double"
    )
    out = kql_to_df(
        {"t": df},
        "t | sort by v | serialize | extend rn = row_number()"
        " | extend dv = v - prev(v)",
    ).collect()
    rows = sorted((r["rn"], r["k"], r["dv"]) for r in out)
    assert rows == [(1, "a", None), (2, "b", 1.0), (3, "c", 2.0)]

    import pytest

    with pytest.raises(ValueError, match="sort"):
        kql_to_df({"t": df}, "t | extend rn = row_number()")


def test_kql_conditional_aggs_and_percentiles(spark):
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 3.0), ("A", 3.0), ("B", 10.0)], "et string, v double"
    )
    out = kql_to_df(
        {"t": df},
        "t | summarize d = dcountif(v, et = 'A'), m = maxif(v, et = 'A'),"
        " a = avgif(v, v < 5.0), percentiles(v, 50, 100)",
    ).collect()[0]
    assert out["d"] == 2 and out["m"] == 3.0
    assert abs(out["a"] - 7.0 / 3) < 1e-12
    assert out["p100_v"] == 10.0


def test_kql_arg_min_picks_earliest(spark, events):
    out = kql_to_df(
        {"events": events}, "events | summarize arg_min(event_id, *) by user_id"
    )
    # one row per user, and it carries the minimal event_id
    import pyspark.sql.functions as Fx

    expect = events.groupBy("user_id").agg(Fx.min("event_id").alias("m"))
    joined = out.join(expect, "user_id")
    assert joined.filter(Fx.col("event_id") != Fx.col("m")).count() == 0
    assert out.count() == events.select("user_id").distinct().count()


def test_kql_top_hitters_and_lookup_shapes(spark, events):
    th = kql_to_df({"events": events}, "events | top-hitters 3 of event_type")
    rows = th.collect()
    assert len(rows) == 3 and rows[0].approximate_count_event_type >= rows[-1].approximate_count_event_type
    dim = events.sparkSession.createDataFrame(
        [("click", "engagement")], "event_type string, family string"
    )
    lk = kql_to_df(
        {"events": events, "dim": dim},
        "events | lookup dim on event_type | where family == 'engagement' | count",
    ).collect()[0].Count
    assert lk == events.filter("event_type = 'click'").count()


def test_serialized_prev_next_offsets(spark):
    """prev(col, n) / next(col) over the distributed serialized path
    must match pandas shift on the pinned sort order."""
    from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

    df = spark.createDataFrame(
        [(i, (i * 7) % 10, float(i * i)) for i in range(20)],
        "event_id long, k long, value double",
    ).repartition(5)
    out = kql_to_df(
        {"t": df},
        "t | sort by k, event_id | serialize"
        " | extend rn = row_number()"
        " | extend p2 = prev(value, 2) | extend nx = next(value)"
        " | project rn, event_id, value, p2, nx",
    ).orderBy("rn").collect()
    rows = sorted(
        ((r.k, r.event_id, r.value) for r in df.collect())
    )
    vals = [v for _, _, v in rows]
    for i, r in enumerate(out):
        assert r.rn == i + 1
        assert r.value == vals[i]
        assert r.p2 == (vals[i - 2] if i >= 2 else None)
        assert r.nx == (vals[i + 1] if i + 1 < len(vals) else None)


# ---------------------------------------------------------------------------
# round 7: mv-apply / materialize() / parse-where
# ---------------------------------------------------------------------------


def test_kql_mv_apply_where_extend(spark):
    T = spark.createDataFrame(
        [(1, [1, 3, 5, 7]), (2, [2, 4]), (3, [])], "k long, xs array<int>"
    )
    out = kql_to_df(
        {"T": T}, "T | mv-apply xs on (where xs > 3 | extend y = xs * 10)"
    )
    rows = sorted((r["k"], r["xs"], r["y"]) for r in out.collect())
    assert rows == [(1, 5, 50), (1, 7, 70), (2, 4, 40)]  # empty array drops


def test_kql_mv_apply_summarize_per_record(spark):
    T = spark.createDataFrame(
        [(1, [1, 3, 5, 7]), (2, [2, 4])], "k long, xs array<int>"
    )
    out = kql_to_df(
        {"T": T}, "T | mv-apply xs on (summarize mx = max(xs), s = sum(xs))"
    )
    rows = sorted((r["k"], r["mx"], r["s"]) for r in out.collect())
    assert rows == [(1, 7, 16), (2, 4, 6)]  # per ORIGINAL record, k kept


def test_kql_mv_apply_top_per_record(spark):
    T = spark.createDataFrame(
        [(1, [1, 3, 5, 7]), (2, [2, 4])], "k long, xs array<int>"
    )
    out = kql_to_df({"T": T}, "T | mv-apply xs on (top 2 by xs desc)")
    rows = sorted((r["k"], r["xs"]) for r in out.collect())
    assert rows == [(1, 5), (1, 7), (2, 2), (2, 4)]


def test_kql_parse_where_drops_nonmatching(spark):
    L = spark.createDataFrame(
        [("dur=15 ms",), ("garbage",), ("dur=7 ms",)], "line string"
    )
    kept = kql_to_df({"L": L}, "L | parse-where line with 'dur=' d ' ms'")
    assert sorted(r["d"] for r in kept.collect()) == ["15", "7"]
    # plain parse keeps all rows (empty captures on non-matches)
    allr = kql_to_df({"L": L}, "L | parse line with 'dur=' d ' ms'")
    assert allr.count() == 3


def test_kql_materialize_let(spark):
    T = spark.createDataFrame(
        [(1, [1, 3, 5, 7]), (2, [2, 4]), (3, [])], "k long, xs array<int>"
    )
    out = kql_to_df(
        {"T": T},
        "let M = materialize(T | mv-expand xs | summarize c = count() by k);"
        " M | union (M) | summarize t = sum(c) by k",
    )
    rows = sorted((r["k"], r["t"]) for r in out.collect())
    assert rows == [(1, 8), (2, 4)]


def test_kql_pipe_split_respects_parens_and_quotes(spark):
    # a quoted '|' must not split the pipe
    L = spark.createDataFrame([("a|b",), ("c",)], "line string")
    out = kql_to_df({"L": L}, "L | where line contains '|'")
    assert [r["line"] for r in out.collect()] == ["a|b"]


def test_kql_mv_apply_to_typeof_cast(spark):
    T = spark.createDataFrame(
        [("a", ["1", "2", "30"]), ("b", ["4"])], "k string, xs array<string>"
    )
    r = kql_to_df(
        {"T": T}, "T | mv-apply xs to typeof(long) on (where xs > 3)"
    ).collect()
    assert sorted((x["k"], x["xs"]) for x in r) == [("a", 30), ("b", 4)]


def test_kql_datatable_source_and_let(spark):
    T = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    out = kql_to_df(
        {"T": T},
        """
        let D = datatable (k: string, w: long) ['a', 10, 'b', 20, 'c', 30];
        T | join kind=inner (D) on k | project k, v, w
        """,
    )
    assert sorted((x["k"], x["v"], x["w"]) for x in out.collect()) == [
        ("a", 1, 10), ("b", 2, 20),
    ]
    # bare datatable pipe head, with datetime + null literals
    out2 = kql_to_df(
        {"T": T},
        "datatable (ts: datetime, n: int)"
        " [datetime(2024-01-01 00:00:00), 5, datetime(2024-01-02 00:00:00), null]"
        " | where n > 0 | count",
    )
    assert out2.collect()[0]["Count"] == 1


def test_kql_membership_operators(spark):
    K = spark.createDataFrame([("a",), ("B",), ("c",)], "v string")
    assert sorted(
        x["v"] for x in kql_to_df({"K": K}, "K | where v in~ ('A', 'b')").collect()
    ) == ["B", "a"]
    assert [
        x["v"] for x in kql_to_df({"K": K}, "K | where v !in ('a', 'c')").collect()
    ] == ["B"]
    E = spark.createDataFrame(
        [("Alpha beta",), ("gamma",), ("delta x",)], "t string"
    )
    assert sorted(
        x["t"]
        for x in kql_to_df(
            {"E": E}, "E | where t has_any ('alpha', 'delta')"
        ).collect()
    ) == ["Alpha beta", "delta x"]


def test_kql_union_multiple_and_project_reorder(spark):
    A = spark.createDataFrame([(1, "a")], "k long, v string")
    B = spark.createDataFrame([(2,)], "k long")
    C = spark.createDataFrame([(3, "c")], "k long, v string")
    out = kql_to_df({"A": A, "B": B, "C": C}, "A | union B, C | sort by k asc")
    rows = [(r["k"], r["v"]) for r in out.collect()]
    assert rows == [(1, "a"), (2, None), (3, "c")]  # missing col -> null
    re_out = kql_to_df({"A": A}, "A | project-reorder v")
    assert re_out.columns == ["v", "k"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),
            st.lists(st.integers(-10, 10), max_size=6),
        ),
        min_size=1,
        max_size=8,
    ),
    thr=st.integers(-5, 5),
)
def test_kql_mv_apply_matches_python_model(spark, rows, thr):
    # mv-apply (where …| summarize …) against a pure-Python model:
    # empty arrays drop the record; summarize is per ORIGINAL record
    data = [(i, k, xs) for i, (k, xs) in enumerate(rows)]
    T = spark.createDataFrame(data, "rid long, k long, xs array<int>")
    out = kql_to_df(
        {"T": T},
        f"T | mv-apply xs on (where xs > {thr} | summarize mx = max(xs), c = count())",
    ).collect()
    got = {(r["rid"], r["k"]): (r["mx"], r["c"]) for r in out}
    want = {}
    for i, (k, xs) in enumerate(rows):
        surv = [x for x in xs if x > thr]
        if surv:
            want[(i, k)] = (max(surv), len(surv))
    assert got == want


def test_kql_mv_apply_extend_then_summarize_one_row_per_record(spark):
    # regression: an extend-derived per-element column must not become a
    # summarize group key (it would fracture the per-record aggregate)
    T = spark.createDataFrame([(1, [1, 2, 3, 4]), (2, [5])], "k long, xs array<int>")
    r = kql_to_df(
        {"T": T}, "T | mv-apply xs on (extend y = xs % 2 | summarize c = count())"
    ).collect()
    assert sorted((x["k"], x["c"]) for x in r) == [(1, 4), (2, 1)]


def test_kql_has_any_and_in_tilde_edge_literals(spark):
    # regex metachars in has_any terms stay literal through the SQL
    # string layer; in~ handles quoted commas via the csv splitter
    E = spark.createDataFrame([("ip 1.2.3.4 ok",), ("ip 1x2x3x4 bad",)], "t string")
    got = kql_to_df({"E": E}, "E | where t has_any ('1.2.3.4', '9.9.9.9')").collect()
    assert [x["t"] for x in got] == ["ip 1.2.3.4 ok"]
    K = spark.createDataFrame([("a,b",), ("C",)], "v string")
    got2 = kql_to_df({"K": K}, "K | where v in~ ('A,B', 'z')").collect()
    assert [x["v"] for x in got2] == ["a,b"]


def test_kql_has_and_contains_literal_metachars(spark):
    E = spark.createDataFrame(
        [("ip 1.2.3.4 here",), ("ip 1x2x3x4 no",), ("a_b inside",),
         ("aXb not",), ("100% sure",), ("100g unsure",)],
        "t string",
    )
    # `has`: regex metachars stay literal through the SQL string layer
    r = kql_to_df({"E": E}, "E | where t has '1.2.3.4'").collect()
    assert [x["t"] for x in r] == ["ip 1.2.3.4 here"]
    # contains/startswith/endswith: LIKE wildcards in the term are literal
    assert [
        x["t"] for x in kql_to_df({"E": E}, "E | where t contains 'a_b'").collect()
    ] == ["a_b inside"]
    assert [
        x["t"] for x in kql_to_df({"E": E}, "E | where t contains '100%'").collect()
    ] == ["100% sure"]
    assert [
        x["t"]
        for x in kql_to_df({"E": E}, "E | where t startswith 'ip 1.2'").collect()
    ] == ["ip 1.2.3.4 here"]
    assert sorted(
        x["t"] for x in kql_to_df({"E": E}, "E | where t endswith 'sure'").collect()
    ) == ["100% sure", "100g unsure"]


def test_kql_mv_apply_extend_overwriting_record_column(spark):
    # Kusto's extend REPLACES an existing column; the per-record
    # summarize must still group on the ORIGINAL record value (hidden
    # pre-explode snapshot), not the per-element overwrite
    T = spark.createDataFrame([(1, [1, 2, 3, 4]), (2, [5])], "k long, xs array<int>")
    r = kql_to_df(
        {"T": T}, "T | mv-apply xs on (extend k = xs % 2 | summarize c = count())"
    ).collect()
    assert sorted((x["k"], x["c"]) for x in r) == [(1, 4), (2, 1)]
    # without summarize, the overwritten per-element k IS the output
    r2 = kql_to_df(
        {"T": T}, "T | mv-apply xs on (extend k = xs % 2 | where xs > 2)"
    ).collect()
    assert sorted((x["k"], x["xs"]) for x in r2) == [(0, 4), (1, 3), (1, 5)]


def test_kql_expr_rewrites_never_touch_literal_contents(spark):
    # phase-2 rewrites (==, scalar renames, datetime) run on MASKED
    # literals: term contents survive verbatim
    E = spark.createDataFrame(
        [("a==b",), ("a=b",), ("call strcat(x) here",), ("plain",)], "t string"
    )
    got = kql_to_df({"E": E}, "E | where t contains '=='").collect()
    assert [x["t"] for x in got] == ["a==b"]
    got2 = kql_to_df({"E": E}, "E | where t contains 'strcat(x)'").collect()
    assert [x["t"] for x in got2] == ["call strcat(x) here"]


def test_kql_mv_apply_snapshot_lifecycle(spark):
    T = spark.createDataFrame([(1, [1, 2, 3, 4]), (2, [5])], "k long, xs array<int>")
    # project-away of an overwritten record column stays dropped
    r = kql_to_df(
        {"T": T},
        "T | mv-apply xs on (extend k = xs % 2 | project-away k | summarize c = count())",
    ).collect()
    assert sorted(r[0].asDict().keys()) == ["c"]
    assert sorted(x["c"] for x in r) == [1, 4]
    # a second summarize groups on the RESTORED original column
    r2 = kql_to_df(
        {"T": T},
        "T | mv-apply xs on (extend k = xs % 2 | summarize c = count()"
        " | summarize s = sum(c) by k)",
    ).collect()
    assert sorted((x["k"], x["s"]) for x in r2) == [(1, 4), (2, 1)]
