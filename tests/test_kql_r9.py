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
