"""Kusto ``fork`` (round 11): one pipe, parallel consumer branches,
each its own result table. Closes the last mainstream tabular operator
absent from the dialect (r10 verdict "What's missing" #4)."""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.sources.kql import (
    kql_fork,
    kql_to_df,
)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        ("u1", "click", 5.0), ("u1", "view", 2.0), ("u2", "click", 9.0),
        ("u2", "error", 1.0), ("u3", "view", 4.0), ("u3", "click", 7.0),
        ("u1", "click", 3.0),
    ]
    return spark.createDataFrame(rows, "uid string, et string, v double")


def test_fork_three_branches_named_and_default(ev):
    out = kql_fork(
        {"T": ev},
        "T | where v > 1"
        " | fork (count)"
        " byet=(summarize n = count(), s = sum(v) by et)"
        " (top 2 by v | project uid, v)",
    )
    assert sorted(out) == ["byet", "fork_0", "fork_2"]
    assert out["fork_0"].collect()[0][0] == 6  # v>1 drops the error row
    byet = {r["et"]: (r["n"], r["s"]) for r in out["byet"].collect()}
    assert byet == {"click": (4, 24.0), "view": (2, 6.0)}
    top = [(r["uid"], r["v"]) for r in out["top"]] if False else sorted(
        (r["uid"], r["v"]) for r in out["fork_2"].collect()
    )
    assert top == [("u2", 9.0), ("u3", 7.0)]


def test_fork_empty_branch_is_passthrough(ev):
    out = kql_fork({"T": ev}, "T | fork raw=() (where et == 'error')")
    assert out["raw"].count() == 7
    assert out["fork_1"].count() == 1


def test_fork_branch_can_join_session_tables(ev, spark):
    dim = spark.createDataFrame(
        [("click", "c"), ("view", "v"), ("error", "e")],
        "et string, code string",
    )
    out = kql_fork(
        {"T": ev, "D": dim},
        "T | fork j=(join kind=inner (D) on et"
        " | summarize n = count() by code)",
    )
    got = {r["code"]: r["n"] for r in out["j"].collect()}
    assert got == {"c": 4, "v": 2, "e": 1}


def test_fork_literal_parens_and_pipes_in_branch(ev):
    out = kql_fork(
        {"T": ev}, "T | fork (where et has_any ('click') | count)"
    )
    assert out["fork_0"].collect()[0][0] == 4


def test_fork_errors_loud(ev):
    with pytest.raises(ValueError, match="use[\\s\\S]*kql_fork"):
        kql_to_df({"T": ev}, "T | fork (count)")
    with pytest.raises(ValueError, match="LAST stage"):
        kql_fork({"T": ev}, "T | fork (count) | take 3")
    with pytest.raises(ValueError, match="at least one"):
        kql_fork({"T": ev}, "T | fork ")
    with pytest.raises(ValueError, match="duplicate branch"):
        kql_fork({"T": ev}, "T | fork a=(count) a=(count)")
    with pytest.raises(ValueError, match="no fork stage"):
        kql_fork({"T": ev}, "T | take 3")
    with pytest.raises(ValueError, match="unbalanced"):
        kql_fork({"T": ev}, "T | fork (count")


def test_fork_shared_prefix_single_persist(ev):
    out = kql_fork(
        {"T": ev}, "T | where v > 2 | fork (count) (summarize max(v))",
        share_source=True,
    )
    # both branches read the SAME persisted prefix frame: the physical
    # plans reference an InMemoryRelation, not a fresh scan
    for df in out.values():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    assert out["fork_0"].collect()[0][0] == 5
    assert out["fork_1"].collect()[0][0] == 9.0
