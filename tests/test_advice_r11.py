"""Regression pins for the round-11 ADVICE items.

1. medium — ipv4_lookup return_unmatched=true must not join an
   aggregated branch back to the source on a monotonically_increasing_id
   row id (two evaluations of a nondeterministic id across an un-reused
   exchange can disagree and silently mis-enrich rows). It now runs ONE
   linear plan: left fan-join + max(struct) groupBy — exactly one join
   in the physical plan, ids evaluated once.
2. low — a pipe ending in make-graph with no graph-match must raise
   (Kusto: a graph is not a tabular result), not silently return the
   raw edge frame.
3. low — parse_url 'Query Parameters' must keep-last on duplicate keys
   (?a=1&a=2) instead of throwing under mapKeyDedupPolicy=EXCEPTION,
   and URL-decode values like Kusto.
4. low — toscalar yielding NaN/Infinity must raise a descriptive
   ValueError instead of splicing '(nan)' and dying as an opaque parse
   error downstream.
5. low — ipv4_compare accepts Kusto's optional third prefix argument.
"""

import json
import math

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture(scope="module")
def ipfix(spark):
    ips = spark.createDataFrame(
        [("a", "10.1.2.3"), ("b", "10.1.9.9"), ("d", "8.8.8.8")],
        "name string, ip string",
    )
    lut = spark.createDataFrame(
        [("10.0.0.0/8", "corp"), ("10.1.0.0/16", "branch"),
         ("10.1.2.0/24", "lab"), ("10.1.2.3", "host")],
        "cidr string, net string",
    )
    return {"t": ips, "nets": lut}


def test_ipv4_lookup_unmatched_single_join_linear_plan(ipfix):
    out = kql_to_df(
        ipfix,
        "t | evaluate ipv4_lookup(nets, ip, cidr, return_unmatched=true)",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly ONE join (the broadcast fan join); no second join back to
    # the source on a minted row id
    joins = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "BroadcastExchange" not in ln
    ]
    assert len(joins) == 1, plan
    got = {r["name"]: r["net"] for r in out.collect()}
    assert got == {"a": "host", "b": "branch", "d": None}


def test_ipv4_lookup_unmatched_after_shuffle_stage(ipfix):
    # an upstream shuffle (summarize) between the scan and the lookup —
    # the historical hazard case for a re-evaluated branch id
    out = kql_to_df(
        ipfix,
        "t | summarize n = count() by name, ip"
        " | evaluate ipv4_lookup(nets, ip, cidr, return_unmatched=true)",
    )
    got = {r["name"]: (r["net"], r["n"]) for r in out.collect()}
    assert got == {
        "a": ("host", 1), "b": ("branch", 1), "d": (None, 1),
    }


def test_make_graph_without_graph_match_raises(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src int, dst int"
    )
    with pytest.raises(ValueError, match="graph-match"):
        kql_to_df({"e": edges}, "e | make-graph src --> dst")


def test_parse_url_duplicate_query_keys_keep_last_and_decode(spark):
    df = spark.range(1).selectExpr(
        "'https://h.io/p?a=1&a=2&msg=hello%20world&flag' as u",
    )
    row = kql_to_df(
        {"t": df}, "t | extend b = parse_url(u) | project b"
    ).collect()[0]
    bag = json.loads(row["b"])
    assert bag["Query Parameters"] == {
        "a": "2",               # keep-last, no map-dedup exception
        "msg": "hello world",   # %-escapes decoded like Kusto
        "flag": "",             # bare key -> empty value
    }


def test_parse_url_malformed_url_yields_empty_bag_not_error(spark):
    # '%zz' makes the whole URL invalid to the JVM URI parser; Kusto
    # degrades instead of erroring — the bag builder uses try_parse_url
    # so every part renders '' rather than crashing the query
    df = spark.range(1).selectExpr("'http://h.io/?x=%zz' as u")
    row = kql_to_df(
        {"t": df}, "t | extend b = parse_url(u) | project b"
    ).collect()[0]
    bag = json.loads(row["b"])
    assert bag["Query Parameters"] == {} and bag["Host"] == ""


def test_toscalar_nonfinite_raises_descriptive(spark):
    df = spark.createDataFrame(
        [(float("nan"),), (float("nan"),)], "v double"
    )
    with pytest.raises(ValueError, match="non-finite"):
        kql_to_df(
            {"t": df},
            "let m = toscalar(t | summarize max(v));"
            " t | where v < m",
        )
    assert math.isnan(df.agg(F.max("v")).collect()[0][0])  # sanity


def test_ipv4_compare_three_arg_prefix(spark):
    df = spark.range(1)
    row = kql_to_df(
        {"t": df},
        "t | extend same16 = ipv4_compare('10.1.2.3', '10.1.9.9', 16),"
        " diff24 = ipv4_compare('10.1.2.3', '10.1.9.9', 24),"
        " plain = ipv4_compare('10.1.2.3', '10.1.2.3')"
        " | project same16, diff24, plain",
    ).collect()[0]
    assert row["same16"] == 0
    assert row["diff24"] == -1
    assert row["plain"] == 0
