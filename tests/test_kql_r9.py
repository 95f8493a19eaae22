"""Round-9 KQL widening: join hint.strategy / hint.shufflekey and
``facet by`` (verdict item #6)."""

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), ("b", None, 4)],
        "g string, h string, v int",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([("a", 10.0), ("b", 20.0)], "g string, w double")


def test_join_hint_broadcast_in_plan(fact, dim):
    j = kql_to_df(
        {"T": fact, "R": dim},
        "T | join kind=inner hint.strategy=broadcast (R) on g",
    )
    assert sorted((r["g"], r["v"], r["w"]) for r in j.collect()) == [
        ("a", 1, 10.0), ("a", 2, 10.0), ("b", 3, 20.0), ("b", 4, 20.0),
    ]
    assert "Broadcast" in j._jdf.queryExecution().executedPlan().toString()


def test_join_hint_shuffle_forces_hash_join(fact, dim):
    # hint order is free: hint before kind must parse too
    j = kql_to_df(
        {"T": fact, "R": dim},
        "T | join hint.strategy=shuffle kind=inner (R) on g",
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert j.count() == 4


def test_join_hint_shufflekey_accepted(fact, dim):
    j = kql_to_df({"T": fact, "R": dim}, "T | join hint.shufflekey=g (R) on g")
    # default kind innerunique: one left row per key
    assert j.count() == 2


def test_join_unknown_hint_raises(fact, dim):
    with pytest.raises(ValueError, match="unsupported join hint"):
        kql_to_df({"T": fact, "R": dim}, "T | join hint.remote=left (R) on g")
    with pytest.raises(ValueError, match="hint.strategy"):
        kql_to_df(
            {"T": fact, "R": dim}, "T | join hint.strategy=banana (R) on g"
        )


def test_facet_by_long_form(fact):
    rows = {
        (r["facet_column"], r["facet_value"]): r["count_"]
        for r in kql_to_df({"T": fact}, "T | facet by g, h").collect()
    }
    assert rows == {
        ("g", "a"): 2, ("g", "b"): 2,
        ("h", "x"): 2, ("h", "y"): 1, ("h", None): 1,
    }


def test_facet_single_scan_single_shuffle(fact):
    out = kql_to_df({"T": fact}, "T | facet by g, h")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # grouping sets, not N jobs
    assert "Expand" in plan


def test_facet_unknown_column_raises(fact):
    with pytest.raises(ValueError, match="unknown column"):
        kql_to_df({"T": fact}, "T | facet by nope")


def test_scalar_extras2_family(spark):
    import datetime

    df = spark.createDataFrame(
        [("a.b.c", "  xx hello xx", "abab",
          datetime.datetime(2024, 1, 7, 13, 30), "g1")],
        "path string, msg string, rep string, ts timestamp, g string",
    )
    r = kql_to_df(
        {"T": df},
        "T | extend first = split(path, '.')[0],"
        " nparts = array_length(split(path, '.')),"
        " joined = strcat_delim('-', g, path),"
        " nab = countof(rep, 'ab'),"
        " trimmed = trim('x| ', msg),"
        " day = format_datetime(ts, 'yyyy-MM-dd'),"
        " dow = dayofweek(ts),"
        " eod = endofday(ts),"
        " eom = endofmonth(ts),"
        " hx = tohex(5910),"
        " nbytes = string_size(path),"
        " caps = extract_all('([a-z])\\.', path),"
        " h = hash(g, 100)",
    ).collect()[0]
    assert r["first"] == "a" and r["nparts"] == 3
    assert r["joined"] == "g1-a.b.c" and r["nab"] == 2
    assert r["trimmed"] == "hello"  # regex trim: x OR space, both ends
    assert r["day"] == "2024-01-07" and r["dow"] == 0  # Sunday
    assert str(r["eod"]) == "2024-01-07 23:59:59.999999"
    assert str(r["eom"]) == "2024-01-31 23:59:59.999999"
    assert r["hx"] == "1716" and r["nbytes"] == 5
    assert r["caps"] == ["a", "b"]
    assert 0 <= r["h"] < 100


def test_take_any_and_dcount_accuracy(spark):
    df = spark.createDataFrame(
        [("g1", "x", 1.5), ("g1", "y", 2.5), ("g2", "z", 3.5)],
        "g string, s string, v double",
    )
    rows = {
        r["g"]: (r["a"], r["d"])
        for r in kql_to_df(
            {"T": df},
            "T | summarize a = take_any(v), d = dcount(s, 4) by g",
        ).collect()
    }
    # take_any is the pinned deterministic MIN; dcount ignores the
    # accuracy knob and counts exactly
    assert rows == {"g1": (1.5, 2), "g2": (3.5, 1)}


def test_search_operator(spark):
    df = spark.createDataFrame(
        [("Error in pipeline", "alpha"), ("all good", "beta"),
         ("ERRORS everywhere", "error")],
        "msg string, tag string",
    )
    q = lambda s: sorted(
        r["tag"] for r in kql_to_df({"T": df}, s).collect()
    )
    # whole-term, case-insensitive, ANY string column
    assert q("T | search 'error'") == ["alpha", "error"]
    assert q("T | search kind=case_sensitive 'Error'") == ["alpha"]
    assert q("T | search 'error*'") == ["alpha", "error"]  # hasprefix
    with pytest.raises(ValueError, match="search kind"):
        kql_to_df({"T": df}, "T | search kind=regex 'x'")


def test_evaluate_narrow(spark):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "k int, s string")
    rows = sorted(
        (r["Row"], r["Column"], r["Value"])
        for r in kql_to_df(
            {"T": df}, "T | sort by k asc | evaluate narrow()"
        ).collect()
    )
    assert rows == [
        (0, "k", "1"), (0, "s", "a"), (1, "k", "2"), (1, "s", "b"),
    ]
    with pytest.raises(ValueError, match="sort"):
        kql_to_df({"T": df}, "T | evaluate narrow()")


def test_percentilew_weighted_cdf(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 8.0)],
        "k string, v double, w double",
    )
    got = kql_to_df(
        {"T": df},
        "T | summarize p50 = percentilew(v, w, 50) by k",
    ).collect()
    assert [(r["k"], r["p50"]) for r in got] == [("g", 3.0)]
    # multi-prob form keeps the generated wpNN_ names
    got2 = kql_to_df(
        {"T": df}, "T | summarize percentilesw(v, w, 20, 90) by k"
    ).collect()[0]
    assert got2["wp20_v"] == 2.0 and got2["wp90_v"] == 3.0


def test_scalar_extras3_family(spark):
    df = spark.createDataFrame([("a", 3.7, 12.0)], "k string, v double, w double")
    r = kql_to_df(
        {"T": df},
        "T | extend lo = min_of(v, w, 2.5), hi = max_of(v, w),"
        " c = ceiling(v), b = bin(w, 5), f = floor(w, 5),"
        " fin = isfinite(v), inf = isinf(todouble('Infinity')),"
        " sl = array_slice(split('a,b,c,d', ','), 1, 2),"
        " ix = array_index_of(split('a,b,c', ','), 'b'),"
        " miss = array_index_of(split('a,b', ','), 'z'),"
        " pj = pack('x', k) | extend pa = pack_all()",
    ).collect()[0]
    assert r["lo"] == 2.5 and r["hi"] == 12.0
    assert r["c"] == 4 and r["b"] == 10 and r["f"] == 10
    assert r["fin"] is True and r["inf"] is True
    assert r["sl"] == ["b", "c"]  # end-INCLUSIVE 0-based
    assert r["ix"] == 1 and r["miss"] == -1
    assert r["pj"] == '{"x":"a"}'
    assert '"k":"a"' in r["pa"] and '"v":3.7' in r["pa"]


def test_union_kinds_distinct_star_wildcards_null_order(spark):
    A = spark.createDataFrame(
        [(1, "a", 2.0), (1, "a", 2.0)], "k int, s string, v double"
    )
    B = spark.createDataFrame([(2, 9.9)], "k int, w double")
    inner = kql_to_df({"A": A, "B": B}, "A | union kind=inner (B)")
    assert inner.columns == ["k"] and inner.count() == 3
    outer = kql_to_df({"A": A, "B": B}, "A | union kind=outer B")
    assert sorted(outer.columns) == ["k", "s", "v", "w"]
    with pytest.raises(ValueError, match="union kind"):
        kql_to_df({"A": A, "B": B}, "A | union kind=banana B")
    assert kql_to_df({"A": A}, "A | distinct *").count() == 1
    assert kql_to_df({"A": A}, "A | project-keep s*, k").columns == ["k", "s"]
    assert kql_to_df({"A": A}, "A | project-away v*").columns == ["k", "s"]
    with pytest.raises(ValueError, match="unknown column"):
        kql_to_df({"A": A}, "A | project-away nope")
    N = spark.createDataFrame([(None,), (2,), (1,)], "x int")
    assert [
        r["x"]
        for r in kql_to_df({"A": N}, "A | sort by x desc nulls last").collect()
    ] == [2, 1, None]
    assert [
        r["x"]
        for r in kql_to_df({"A": N}, "A | sort by x asc nulls first").collect()
    ] == [None, 1, 2]


def test_make_series_multi_aggregate_single_pass(spark):
    import datetime

    df = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1, 5), 10.0),
         ("a", datetime.datetime(2024, 1, 1, 7), 20.0),
         ("a", datetime.datetime(2024, 1, 3, 1), 6.0)],
        "k string, ts timestamp, v double",
    )
    out = kql_to_df(
        {"T": df},
        "T | make-series n=count(), sv=sum(v) on ts"
        " from datetime(2024-01-01) to datetime(2024-01-04) step 1d by k",
    )
    r = out.collect()[0]
    assert r["n"] == [2.0, 0.0, 1.0]
    assert r["sv"] == [30.0, 0.0, 6.0]
    # one pass: a single (keys, bin) aggregate feeds both series — no
    # second scan of the fact table (use the optimized LOGICAL plan;
    # AdaptiveSparkPlan.toString prints initial+final physical plans,
    # double-counting scans textually)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_series_elementwise_arithmetic(spark):
    df = spark.createDataFrame([(1,)], "id int")
    r = kql_to_df(
        {"T": df},
        "T | extend a = pack_array(1, 2, 0), b = pack_array(4.0, 5.0, 6.0)"
        " | extend s = series_add(a, b), d = series_divide(b, a),"
        " m = series_multiply(a, b), ab = series_abs(series_subtract(a, b))",
    ).collect()[0]
    assert r["s"] == [5.0, 7.0, 6.0]
    assert r["d"] == [4.0, 2.5, None]  # zero divisor -> null, not error
    assert r["m"] == [4.0, 10.0, 0.0]
    assert r["ab"] == [3.0, 3.0, 6.0]


def test_has_all_negated_membership_and_between(spark):
    df = spark.createDataFrame(
        [("alpha beta", "A", 1), ("beta gamma", "B", 5), ("alpha", "a", 9)],
        "t string, g string, n int",
    )
    q = lambda s: sorted(r["n"] for r in kql_to_df({"T": df}, s).collect())
    assert q("T | where t has_all ('alpha', 'beta')") == [1]
    assert q("T | where t has_any ('gamma', 'alpha')") == [1, 5, 9]
    assert q("T | where g !in~ ('a')") == [5]  # case-insensitive NOT IN
    assert q("T | where n !between (2 .. 8)") == [1, 9]
    with pytest.raises(ValueError, match="has_all"):
        kql_to_df({"T": df}, "T | where t has_all (g)")


def test_dynamic_literals(spark):
    df = spark.createDataFrame([(1,)], "id int")
    r = kql_to_df(
        {"T": df},
        'T | extend a = dynamic([1, 2, 3]), sa = dynamic([\'x\', \'y\']),'
        ' bag = dynamic({"k": 7, "s": "hi"})'
        " | extend n = array_length(a), second = sa[1],"
        " kv = toint(todynamic(bag).k)",
    ).collect()[0]
    assert r["a"] == [1, 2, 3] and r["sa"] == ["x", "y"]
    assert r["n"] == 3 and r["second"] == "y" and r["kv"] == 7


def test_mv_expand_parallel_multicolumn(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = kql_to_df(
        {"T": df},
        "T | extend a = dynamic([1, 2, 3]), b = dynamic(['x', 'y'])"
        " | mv-expand with_itemindex=i a to typeof(long), b",
    )
    rows = sorted((r["i"], r["a"], r["b"]) for r in out.collect())
    # Kusto zips positionally; the shorter array pads with null
    assert rows == [(0, 1, "x"), (1, 2, "y"), (2, 3, None)]
    # single-column form unchanged
    out2 = kql_to_df({"T": df}, "T | extend a = dynamic([5, 6]) | mv-expand a")
    assert sorted(r["a"] for r in out2.collect()) == [5, 6]


def test_prev_next_default_third_arg(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k int, v double")
    r = kql_to_df(
        {"T": df},
        "T | sort by k asc | extend d = v - prev(v, 1, 0.0)"
        " | project k, d",
    )
    assert sorted((x["k"], x["d"]) for x in r.collect()) == [
        (1, 10.0), (2, 10.0), (3, 10.0),
    ]


def test_cli_entrypoint_kql_and_sql(spark, sf_dir, capsys):
    # the CLI owns its own SparkSession; run it in-process against the
    # module API (getOrCreate reuses the test session, stop() is safe
    # at the end of each invocation — create a throwaway run last)
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "azuredataengineering_deeplearning_spark",
         "--list-queries"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0
    names = out.stdout.split()
    assert "q1_pricing_summary" in names and "kql_facet_by" in names


def test_evaluate_basket(spark):
    rows = [("us", "web", "err")] * 6 + [("us", "app", "ok")] * 3 + [
        ("eu", "web", "ok")
    ]
    df = spark.createDataFrame(rows, "region string, channel string, status string")
    got = {
        (r["region"], r["channel"], r["status"]): (r["count_"], r["percent"])
        for r in kql_to_df({"T": df}, "T | evaluate basket(0.5)").collect()
    }
    # only itemsets covering >= 50% of 10 rows; NULL = wildcard
    assert got == {
        ("us", None, None): (9, 90.0),
        (None, "web", None): (7, 70.0),
        (None, None, "err"): (6, 60.0),
        ("us", "web", None): (6, 60.0),
        ("us", None, "err"): (6, 60.0),
        (None, "web", "err"): (6, 60.0),
        ("us", "web", "err"): (6, 60.0),
    }
    with pytest.raises(ValueError, match="string columns"):
        kql_to_df({"T": spark.range(3)}, "T | evaluate basket(0.1)")
