"""Round-10 additions: Kusto activity_metrics / new_activity_metrics /
session_count / funnel_sequence_completion / reduce-by / HLL sketch
functions. Hand-built frames pin the dialect edge cases the sf-level
DuckDB oracles can't isolate (gap bins, non-greedy funnel starts,
loud-error contracts)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators.timeseries import (
    activity_metrics,
    funnel_sequence_completion,
    new_activity_metrics,
    session_count,
)
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

SF = "/root/testdata/sf0.001"


def _ts(day, hour=0, minute=0, second=0):
    return dt.datetime(2024, 1, day, hour, minute, second)


def _events(spark, rows):
    return spark.createDataFrame(rows, "u string, ts timestamp")


@pytest.mark.slow
def test_activity_metrics_gap_bin_zero_rates(spark):
    # users active day 1 and day 3, nobody day 2: day-2 churn = 1.0
    # (vs day 1), day-3 rates = 0.0 (empty previous bin renders 0.0)
    df = _events(
        spark,
        [("a", _ts(1)), ("b", _ts(1)), ("a", _ts(3)), ("b", _ts(3))],
    )
    out = {
        r["Timeline"].day: r
        for r in activity_metrics(
            df, "u", "ts", "2024-01-01", "2024-01-03", 86400
        ).collect()
    }
    assert out[1]["dcount_values"] == 2 and out[1]["dcount_newvalues"] == 2
    assert out[1]["retention_rate"] == 0.0  # no previous bin
    assert out[2]["dcount_values"] == 0
    assert out[2]["churn_rate"] == 1.0 and out[2]["retention_rate"] == 0.0
    # day 3 follows an EMPTY bin: both rates 0.0, nothing is "new"
    assert out[3]["dcount_values"] == 2 and out[3]["dcount_newvalues"] == 0
    assert out[3]["retention_rate"] == 0.0 and out[3]["churn_rate"] == 0.0


def test_activity_metrics_partial_retention(spark):
    df = _events(
        spark,
        [("a", _ts(1)), ("b", _ts(1)), ("a", _ts(2)), ("c", _ts(2))],
    )
    out = {
        r["Timeline"].day: r
        for r in activity_metrics(
            df, "u", "ts", "2024-01-01", "2024-01-02", 86400
        ).collect()
    }
    # of day-1's {a, b}: a retained -> retention 1/2, churn 1/2; c is new
    assert out[2]["dcount_values"] == 2 and out[2]["dcount_newvalues"] == 1
    assert out[2]["retention_rate"] == 0.5 and out[2]["churn_rate"] == 0.5


def test_new_activity_metrics_cohorts(spark):
    df = _events(
        spark,
        [
            ("a", _ts(1)), ("b", _ts(1)),          # cohort day1
            ("a", _ts(2)), ("c", _ts(2)),          # c joins day2
            ("b", _ts(3)), ("c", _ts(3)),
        ],
    )
    out = {
        (r["FromTimeline"].day, r["ToTimeline"].day): r
        for r in new_activity_metrics(
            df, "u", "ts", "2024-01-01", "2024-01-03", 86400
        ).collect()
    }
    assert len(out) == 6  # 3 + 2 + 1 (From <= To pairs)
    assert out[(1, 1)]["dcount_new_values"] == 2
    assert out[(1, 1)]["retention_rate"] == 1.0
    assert out[(1, 2)]["dcount_retained_values"] == 1  # only a
    assert out[(1, 2)]["churn_rate"] == 0.5
    assert out[(1, 3)]["dcount_retained_values"] == 1  # only b
    assert out[(2, 2)]["dcount_new_values"] == 1  # c
    assert out[(2, 3)]["dcount_retained_values"] == 1
    # empty cohort day 3: all zeros, rates 0.0
    assert out[(3, 3)]["dcount_new_values"] == 0
    assert out[(3, 3)]["retention_rate"] == 0.0


def test_session_count_rejects_non_multiple_lookback(spark):
    df = _events(spark, [("a", _ts(1))])
    with pytest.raises(ValueError, match="multiple"):
        session_count(
            df, "u", "ts", "2024-01-01", "2024-01-03", 86400, 90000
        ).collect()


def test_funnel_later_start_completes(spark):
    # a has starts at 00:00 and 00:05; the only s2 event is 01:40 after
    # the FIRST start but within the 98-minute window of the SECOND —
    # greedy-over-ALL-starts must count a (the earliest-start-only
    # shortcut would miss it)
    df = spark.createDataFrame(
        [
            ("a", "s1", _ts(1, 0, 0)),
            ("a", "s1", _ts(1, 0, 5)),
            ("a", "s2", _ts(1, 1, 40)),
        ],
        "u string, st string, ts timestamp",
    )
    out = funnel_sequence_completion(
        df, "u", "ts", "st", "2024-01-01", "2024-01-01", 86400,
        ["s1", "s2"], [86400, 98 * 60],
    ).collect()
    got = {r["StateSequence"]: r["dcount"] for r in out}
    assert got == {"s1": 1, "s1>s2": 1}
    # tighten the window below 95 min: no start's chain fits
    out2 = funnel_sequence_completion(
        df, "u", "ts", "st", "2024-01-01", "2024-01-01", 86400,
        ["s1", "s2"], [86400, 90 * 60],
    ).collect()
    assert {r["StateSequence"]: r["dcount"] for r in out2} == {
        "s1": 1, "s1>s2": 0,
    }


def test_funnel_strict_order_and_window_from_start(spark):
    # chain must be strictly increasing in time, and windows measure
    # from the sequence START (not the previous step)
    df = spark.createDataFrame(
        [
            ("a", "s1", _ts(1, 0)),
            ("a", "s2", _ts(1, 1)),
            ("a", "s3", _ts(1, 5)),
            ("b", "s2", _ts(2, 0)),  # s2 BEFORE s1: no chain
            ("b", "s1", _ts(2, 1)),
            ("b", "s3", _ts(2, 2)),
        ],
        "u string, st string, ts timestamp",
    )
    out = funnel_sequence_completion(
        df, "u", "ts", "st", "2024-01-01", "2024-01-02", 86400,
        ["s1", "s2", "s3"], [86400, 2 * 3600, 4 * 3600],
    ).collect()
    got = {
        (r["Period"].day, r["StateSequence"]): r["dcount"] for r in out
    }
    assert got[(1, "s1>s2")] == 1
    # s3 is 5h after a's start > 4h window
    assert got[(1, "s1>s2>s3")] == 0
    assert got[(2, "s1>s2")] == 0  # b's s2 precedes its s1


def test_funnel_arg_validation(spark):
    df = _events(spark, [("a", _ts(1))])
    with pytest.raises(ValueError, match="one .* per sequence state"):
        funnel_sequence_completion(
            df, "u", "ts", "u", "2024-01-01", "2024-01-02", 86400,
            ["s1", "s2"], [60],
        )
    with pytest.raises(ValueError, match="empty sequence"):
        funnel_sequence_completion(
            df, "u", "ts", "u", "2024-01-01", "2024-01-02", 86400, [], []
        )


def test_kql_funnel_parse_errors(spark):
    t = {"events": spark.read.parquet(f"{SF}/events.parquet")}
    with pytest.raises(ValueError, match="literal"):
        kql_to_df(
            t,
            "events | evaluate funnel_sequence_completion(user_id, ts,"
            " datetime(2024-01-01), datetime(2024-01-02), 1d, event_type,"
            " some_column, dynamic([1d]))",
        )
    with pytest.raises(ValueError, match="quoted string literal"):
        kql_to_df(
            t,
            "events | evaluate funnel_sequence_completion(user_id, ts,"
            " datetime(2024-01-01), datetime(2024-01-02), 1d, event_type,"
            " dynamic([view]), dynamic([1d]))",
        )
    with pytest.raises(ValueError, match="takes 8 args"):
        kql_to_df(
            t,
            "events | evaluate funnel_sequence_completion(user_id, ts)",
        )


def test_reduce_by_patterns(spark):
    df = spark.createDataFrame(
        [
            ("req 12 from host7",),
            ("req 9000 from host1",),
            ("token deadbeef00 ok",),
            ("token cafebabe11 ok",),
        ],
        "msg string",
    )
    out = {
        r["Pattern"]: r
        for r in kql_to_df({"t": df}, "t | reduce by msg").collect()
    }
    assert out["req * from host*"]["Count_"] == 2
    assert out["req * from host*"]["Representative"] == "req 12 from host7"
    # >= 8 hex chars collapse as one token (not digit-run fragments)
    assert out["token * ok"]["Count_"] == 2
    # threshold knob accepted + ignored; malformed rest is loud
    kql_to_df({"t": df}, "t | reduce by msg with threshold=0.2").collect()
    with pytest.raises(ValueError, match="reduce needs"):
        kql_to_df({"t": df}, "t | reduce msg")


def test_hll_family_estimate_and_merge(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = {"events": ev}
    exact = ev.select("user_id").distinct().count()
    est = kql_to_df(
        t, "events | summarize d = dcount_hll(hll(user_id))"
    ).collect()[0]["d"]
    assert abs(est - exact) <= max(1, 0.05 * exact)
    # shard sketches re-merged == global sketch estimate (mergeability
    # is the point of hll over dcount)
    merged = kql_to_df(
        t,
        "events | summarize h = hll(user_id) by event_type"
        " | summarize m = hll_merge(h) | project d = dcount_hll(m)",
    ).collect()[0]["d"]
    assert merged == est
    # accuracy knob maps to a larger sketch and stays close to exact
    est4 = kql_to_df(
        t, "events | summarize d = dcount_hll(hll(user_id, 4))"
    ).collect()[0]["d"]
    assert abs(est4 - exact) <= max(1, 0.05 * exact)


def test_hll_scalar_two_arg_merge(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = {"events": ev}
    # split-by-predicate sketches unioned via the SCALAR hll_merge
    out = (
        ev.agg(
            F.hll_sketch_agg(
                F.when(F.col("value") < 50, F.col("user_id")), F.lit(12)
            ).alias("h1"),
            F.hll_sketch_agg(
                F.when(F.col("value") >= 50, F.col("user_id")), F.lit(12)
            ).alias("h2"),
        )
    )
    merged = kql_to_df(
        {"t": out}, "t | project d = dcount_hll(hll_merge(h1, h2))"
    ).collect()[0]["d"]
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(1, 0.05 * exact)


def test_kql_activity_metrics_plugin_args(spark):
    t = {"events": spark.read.parquet(f"{SF}/events.parquet")}
    with pytest.raises(ValueError, match="takes 5 args"):
        kql_to_df(
            t,
            "events | evaluate activity_metrics(user_id, ts,"
            " datetime(2024-01-01), datetime(2024-01-30))",
        )
    with pytest.raises(ValueError, match="takes 6 args"):
        kql_to_df(
            t,
            "events | evaluate session_count(user_id, ts,"
            " datetime(2024-01-01), datetime(2024-01-30), 1d)",
        )


def test_render_noop_and_loud(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = {"documents": docs}
    out = kql_to_df(
        t,
        "documents | summarize n = count() by lang"
        " | render barchart with (title='by lang')",
    )
    base = kql_to_df(t, "documents | summarize n = count() by lang")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, base.collect())
    )
    with pytest.raises(ValueError, match="render"):
        kql_to_df(t, "documents | render ???").collect()


def test_scalar_batch4_semantics(spark):
    t = {"documents": spark.read.parquet(f"{SF}/documents.parquet")}
    row = kql_to_df(
        t,
        "documents"
        " | extend ud = url_decode(url_encode('a b/c')),"
        " v1 = parse_version('1.2'), v2 = parse_version('1.10'),"
        " tr = translate('abc', 'xyz', 'aabbcc'),"
        " d = datetime_add('month', -1, datetime(2024-03-31))"
        " | project ud, v1, v2, tr, d | take 1",
    ).collect()[0]
    assert row["ud"] == "a b/c"  # encode/decode round-trips
    assert row["v1"] < row["v2"]  # 1.2 < 1.10 (numeric, not lexicographic)
    assert row["tr"] == "xxyyzz"  # Kusto (from, to, text) arg order
    assert row["d"].month == 2  # calendar-aware month step
    with pytest.raises(ValueError, match="unsupported period"):
        kql_to_df(
            t,
            "documents | extend x ="
            " datetime_add('decade', 1, datetime(2024-01-01))",
        )


def test_autocluster_closed_prune_and_order(spark):
    # 'x' always co-occurs with a=1 tier: the (a1, x) specialization has
    # the SAME count as (a1, null) -> pruned; (a1, null) survives
    df = spark.createDataFrame(
        [("a1", "x")] * 6 + [("a2", "y")] * 3 + [("a2", "z")] * 1,
        "a string, b string",
    )
    out = kql_to_df({"t": df}, "t | evaluate autocluster(20.0, 10)").collect()
    segs = {
        (r["a"], r["b"]): (r["SegmentId"], r["count_"]) for r in out
    }
    assert ("a1", None) in segs and segs[("a1", None)][1] == 6
    assert ("a1", "x") not in segs  # closed-pattern pruned
    # (None, 'x') is size-1: its only generalization is the (absent)
    # grand total, so it stays — size-1 segments never prune each other
    assert segs[(None, "x")][1] == 6
    # ordering: count desc, ties by attribute values nulls-last ->
    # ('a1', None) sorts before (None, 'x') at equal count
    assert segs[("a1", None)][0] == 0 and segs[(None, "x")][0] == 1
    # ('a2', None) at 40% kept; ('a2', 'y') pruned — y only co-occurs
    # with a2, so (None, 'y') is a same-count generalization
    assert segs[("a2", None)][1] == 4 and segs[(None, "y")][1] == 3
    assert ("a2", "y") not in segs
    with pytest.raises(ValueError, match="no string columns"):
        kql_to_df(
            {"n": df.select(F.length("a").alias("l"))},
            "n | evaluate autocluster()",
        )


def test_ipv4_known_values(spark):
    df = spark.range(1).selectExpr("'x' as s")
    row = kql_to_df(
        {"t": df},
        "t | extend a = parse_ipv4('192.168.1.1'),"
        " z = parse_ipv4('192.168.1.1/0'),"
        " eq = ipv4_compare('10.0.0.1', '10.0.0.1'),"
        " gt = ipv4_compare('10.0.0.2', '10.0.0.1'),"
        " m1 = ipv4_is_match('10.1.2.3/16', '10.1.9.9'),"
        " m2 = ipv4_is_match('10.1.2.3', '10.2.2.3'),"
        " outr = ipv4_is_in_range('11.0.0.1', '10.0.0.0/8')"
        " | project a, z, eq, gt, m1, m2, outr",
    ).collect()[0]
    assert row["a"] == 3232235777
    assert row["z"] == 0  # /0 masks everything
    assert row["eq"] == 0 and row["gt"] == 1
    assert row["m1"] is True  # operand's /16 governs the match
    assert row["m2"] is False
    assert row["outr"] is False


def test_sequence_detect_per_step_windows(spark):
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        sequence_detect,
    )

    df = spark.createDataFrame(
        [
            # u1: A@0, B@+5min, C@+5min after B -> detected
            ("u1", _ts(1, 0, 0), True, False, False),
            ("u1", _ts(1, 0, 5), False, True, False),
            ("u1", _ts(1, 0, 10), False, False, True),
            # u2: B arrives 2h after A -> step window (1h) kills it
            ("u2", _ts(1, 0, 0), True, False, False),
            ("u2", _ts(1, 2, 0), False, True, False),
            ("u2", _ts(1, 2, 5), False, False, True),
        ],
        "u string, ts timestamp, fa boolean, fb boolean, fc boolean",
    )
    out = sequence_detect(df, "ts", "u", 3600, 86400, ["fa", "fb", "fc"])
    rows = out.collect()
    assert [r["u"] for r in rows] == ["u1"]
    assert rows[0]["fa"] == _ts(1, 0, 0) and rows[0]["fc"] == _ts(1, 0, 10)


def test_sequence_detect_greedy_canonical_chain(spark):
    # the documented dialect: greedy takes B@+1min; C@+15min is then
    # outside B@+1min's 10-minute window, so NO row — even though the
    # chain through B@+9min would qualify. Pins the canonical-chain
    # rule (both engines share it).
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        sequence_detect,
    )

    df = spark.createDataFrame(
        [
            ("u", _ts(1, 0, 0), True, False),
            ("u", _ts(1, 0, 1), False, True),
            ("u", _ts(1, 0, 9), False, True),
        ],
        "u string, ts timestamp, fa boolean, fb boolean",
    )
    # fb-only chain first: greedy B = +1min
    out = sequence_detect(df, "ts", "u", 600, 86400, ["fa", "fb"])
    assert out.collect()[0]["fb"] == _ts(1, 0, 1)
    with pytest.raises(ValueError, match="at least 2"):
        sequence_detect(df, "ts", "u", 600, 86400, ["fa"])
    with pytest.raises(ValueError, match="no flag column"):
        sequence_detect(df, "ts", "u", 600, 86400, ["fa", "nope"])


def test_dcount_intersect_estimates(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # A = users with value < 50, B = all users, C = users with value < 10
    t = {"events": ev}
    row = kql_to_df(
        t,
        "events"
        " | extend ua = iff(value < 50.0, user_id, tolong(-1)),"
        " uc = iff(value < 10.0, user_id, tolong(-1))"
        " | summarize h1 = hll(ua), h2 = hll(user_id), h3 = hll(uc)"
        " | evaluate dcount_intersect(h1, h2, h3)"
        " | project s0, s1, s2",
    ).collect()[0]
    # A subset of B (modulo the -1 sentinel), C subset of A
    assert row["s1"] >= row["s2"] >= 1
    assert abs(row["s1"] - row["s0"]) <= max(1, 0.1 * row["s0"])
    with pytest.raises(ValueError, match="unsupported evaluate"):
        kql_to_df(t, "events | evaluate dcount_intersect(h1)")


def test_parse_url_bag_and_2arg_passthrough(spark):
    df = spark.range(1).selectExpr(
        "'https://user:pw@example.com:8080/a/b?x=1&y=2#frag' as u",
        "'http://plain.org/p' as v",
    )
    row = kql_to_df(
        {"t": df},
        "t | extend b = parse_url(u), c = parse_url(v)"
        " | extend qx = todynamic(b).Host, pw = todynamic(b).Password"
        " | project b, c, qx, pw",
    ).collect()[0]
    import json

    bag = json.loads(row["b"])
    assert bag["Scheme"] == "https" and bag["Port"] == "8080"
    assert bag["Query Parameters"] == {"x": "1", "y": "2"}
    assert row["pw"] == "pw" and row["qx"] == "example.com"
    # absent parts render '' (Kusto), nested bag empty
    bag2 = json.loads(row["c"])
    assert bag2["Port"] == "" and bag2["Username"] == ""
    assert bag2["Fragment"] == "" and bag2["Query Parameters"] == {}


def test_graph_ops_rejected_on_streams(spark, tmp_path):
    src = spark.readStream.format("rate").option(
        "rowsPerSecond", 1
    ).load()
    with pytest.raises(ValueError, match="STREAMING"):
        kql_to_df(
            {"t": src},
            "t | make-graph value --> value"
            " | graph-match (a)-[e]->(b) project a = a.id",
        )


def test_funnel_sequence_prev_next(spark):
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        funnel_sequence,
    )

    df = spark.createDataFrame(
        [
            ("u1", "browse", _ts(1, 0)),   # prev of the chain
            ("u1", "s1", _ts(1, 1)),
            ("u1", "s2", _ts(1, 2)),
            ("u1", "buy", _ts(1, 3)),      # next after the chain
            ("u2", "s1", _ts(1, 4)),       # chain at the stream edge
            ("u2", "s2", _ts(1, 5)),
        ],
        "u string, st string, ts timestamp",
    )
    out = funnel_sequence(
        df, "u", "ts", "st", "2024-01-01", "2024-01-01", 3600 * 2,
        86400, ["s1", "s2"],
    ).collect()
    got = {(r["kind"], r["state"]): r["dcount"] for r in out}
    assert got[("seq", None)] == 2
    assert got[("prev", "browse")] == 1
    assert got[("prev", None)] == 1   # u2's chain starts the stream
    assert got[("next", "buy")] == 1
    assert got[("next", None)] == 1   # u2's chain ends the stream


def test_rolling_percentile_trailing_window(spark):
    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        rolling_percentile,
    )

    # day1: {1..4}; day2: {100}; window 2 bins at day2 sees
    # {1,2,3,4,100} -> p50 = 3 (lower-CDF), day1 sees {1..4} -> 2
    rows = [(float(v), _ts(1)) for v in (1, 2, 3, 4)] + [(100.0, _ts(2))]
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    out = {
        r["ts"].day: r["rolling_2_percentile_v_50"]
        for r in rolling_percentile(df, "v", 50, "ts", 2, 86400).collect()
    }
    assert out == {1: 2.0, 2: 3.0}
    # window 1 bin: each day stands alone
    out1 = {
        r["ts"].day: r["rolling_1_percentile_v_50"]
        for r in rolling_percentile(df, "v", 50, "ts", 1, 86400).collect()
    }
    assert out1 == {1: 2.0, 2: 100.0}
    with pytest.raises(ValueError, match="not in"):
        rolling_percentile(df, "v", 0, "ts", 2, 86400)
    with pytest.raises(ValueError, match="BinsPerWindow"):
        rolling_percentile(df, "v", 50, "ts", 0, 86400)


def test_ipv4_lookup_longest_prefix(spark):
    ips = spark.createDataFrame(
        [("a", "10.1.2.3"), ("b", "10.1.9.9"), ("d", "8.8.8.8")],
        "name string, ip string",
    )
    lut = spark.createDataFrame(
        [("10.0.0.0/8", "corp"), ("10.1.0.0/16", "branch"),
         ("10.1.2.0/24", "lab"), ("10.1.2.3", "host")],
        "cidr string, net string",
    )
    t = {"t": ips, "nets": lut}
    out = {
        r["name"]: r["net"]
        for r in kql_to_df(
            t, "t | evaluate ipv4_lookup(nets, ip, cidr,"
            " return_unmatched=true)"
        ).collect()
    }
    assert out == {"a": "host", "b": "branch", "d": None}
    inner = kql_to_df(t, "t | evaluate ipv4_lookup(nets, ip, cidr)")
    assert inner.count() == 2  # unmatched dropped by default
    with pytest.raises(ValueError, match="unknown table"):
        kql_to_df(t, "t | evaluate ipv4_lookup(missing, ip, cidr)")
    with pytest.raises(ValueError, match="column collision"):
        kql_to_df(
            {"t": ips.withColumn("net", F.lit("x")), "nets": lut},
            "t | evaluate ipv4_lookup(nets, ip, cidr)",
        )


def test_toscalar_let_inline_and_errors(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    t = {"events": ev}
    hi = ev.selectExpr("percentile(value, 0.95) as p").collect()[0]["p"]
    n = kql_to_df(
        t,
        "let hi = toscalar(events | summarize percentile(value, 95));"
        " events | where value > hi | count",
    ).collect()[0]["Count"]
    assert n == ev.where(F.col("value") > hi).count()
    # inline string splice
    top_type = (
        ev.groupBy("event_type").count().orderBy(
            F.desc("count"), "event_type"
        ).first()["event_type"]
    )
    n2 = kql_to_df(
        t,
        "events | where event_type == toscalar(events"
        " | summarize c = count() by event_type"
        " | sort by c desc, event_type asc | take 1"
        " | project event_type) | count",
    ).collect()[0]["Count"]
    assert n2 == ev.where(F.col("event_type") == top_type).count()
    with pytest.raises(ValueError, match="no rows"):
        kql_to_df(
            t,
            "events | where value > toscalar(events | where value > 1e9"
            " | summarize max(value) | where max_value > 0 | project"
            " max_value) | count",
        )
    quoted = spark.createDataFrame([("it's",)], "s string")
    with pytest.raises(ValueError, match="single quote"):
        kql_to_df(
            {"events": ev, "q": quoted},
            "events | where event_type == toscalar(q | project s | take 1)"
            " | count",
        )


def test_diffpatterns_text_semantics(spark):
    df = spark.createDataFrame(
        [("err 404 on node3", "A")] * 6 + [("err 500 on node9", "B")] * 4
        + [("ok ping 17", "A")] * 2 + [("ok ping 9", "B")] * 2,
        "msg string, split string",
    )
    out = {
        r["Pattern"]: r
        for r in kql_to_df(
            {"t": df},
            "t | evaluate diffpatterns_text(msg, split, 'A', 'B', 0.01)",
        ).collect()
    }
    # digit runs collapse: both error shapes share one pattern
    e = out["err * on node*"]
    assert e["count_a"] == 6 and e["count_b"] == 4
    assert e["percent_a"] == 75.0  # 6 of 8 A-rows
    # the ok pattern's shares differ: 25% vs ~33%
    assert round(out["ok ping *"]["percent_diff_ab"], 2) == round(
        25.0 - 100 * 2 / 6, 2
    )


def test_externaldata_source(spark, tmp_path):
    p = tmp_path / "ext.csv"
    p.write_text("id,name\n1,alpha\n2,beta\n3,gamma\n")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = kql_to_df(
        {"events": ev},
        f"externaldata (id: long, name: string) ['{p}']"
        " with (format='csv', ignoreFirstRecord=true)"
        " | where id > 1 | sort by id asc",
    ).collect()
    assert [(r["id"], r["name"]) for r in out] == [
        (2, "beta"), (3, "gamma"),
    ]
    pj = tmp_path / "ext.json"
    pj.write_text('{"id": 7, "name": "x"}\n{"id": 8, "name": "y"}\n')
    out2 = kql_to_df(
        {"events": ev},
        f"externaldata (id: long, name: string) ['{pj}']"
        " with (format='json') | summarize s = sum(id)",
    ).collect()[0]["s"]
    assert out2 == 15
    with pytest.raises(ValueError, match="bad schema entry"):
        kql_to_df(
            {"events": ev},
            f"externaldata (id: frob) ['{p}'] | count",
        )
    with pytest.raises(ValueError, match="unsupported format"):
        kql_to_df(
            {"events": ev},
            f"externaldata (id: long) ['{p}'] with (format='avro') | count",
        )


def test_union_table_wildcards(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    c = spark.createDataFrame([(3,)], "x int")
    t = {"ev_a": a, "ev_b": b, "other": c}
    out = kql_to_df(
        t, "other | union withsource=src ev_* | sort by x asc"
    ).collect()
    assert [(r["x"], r["src"]) for r in out] == [
        (1, "ev_a"), (2, "ev_b"), (3, "other"),
    ]
    with pytest.raises(ValueError, match="matches no table"):
        kql_to_df(t, "other | union nope_*")


def test_toscalar_text_inside_literal_stays_verbatim(spark):
    df = spark.createDataFrame(
        [("call toscalar(x) here",), ("plain",)], "s string"
    )
    # the literal mentioning toscalar( must NOT trigger evaluation
    out = kql_to_df(
        {"t": df}, "t | where s contains 'toscalar(x)' | count"
    ).collect()[0]["Count"]
    assert out == 1
    # and a real toscalar alongside such a literal still folds, with
    # its own inner literal intact
    n = kql_to_df(
        {"t": df},
        "t | where s != 'toscalar(' and strlen(s) >"
        " toscalar(t | where s == 'plain' | project n = strlen(s)"
        " | take 1) | count",
    ).collect()[0]["Count"]
    assert n == 1
