"""Physical-plan audit helpers — the engine's scale promises, checkable.

Used by ``tests/test_explain_audit.py`` and available to users:
``assert_broadcast_joins(df, 2)`` fails fast if a dim join regressed to
a shuffle, before the job burns cluster hours.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_broadcast_joins(df: DataFrame, at_least: int) -> None:
    plan = executed_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, saw {n}\n{plan}"


def assert_max_exchanges(df: DataFrame, at_most: int) -> None:
    plan = executed_plan(df)
    n = plan.count("Exchange hashpartitioning")
    assert n <= at_most, f"expected <= {at_most} exchanges, saw {n}\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = executed_plan(df)
    assert f"PushedFilters: " in plan and fragment in plan, (
        f"filter '{fragment}' not pushed to scan\n{plan}"
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (ReadSchema)."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", executed_plan(df))
    if not m:
        return set()
    return {c.split(":")[0] for c in m.group(1).split(",") if c}


def plan_summary(df: DataFrame) -> dict:
    """One-glance physical-plan health report for ANY DataFrame — the
    numbers a reviewer checks before a 100 TB run: scan count, shuffle
    (hash-exchange) count, broadcast count, whole-stage-codegen span
    count, widest codegen span, explode/Generate count, sort count,
    whether a cartesian product or a row-at-a-time Python eval
    (BatchEvalPython) appears, and which columns each parquet scan
    actually reads. Pure string analysis of the executed plan — free to
    call, safe in CI asserts. Under AQE the codegen span count is only
    populated AFTER an action has run (the adaptive plan finalizes
    codegen per stage) — call after `.collect()` on the SAME DataFrame
    when you need it (`.count()` builds a different plan and leaves
    this one unexecuted)."""
    # after execution AQE's toString appends an "== Initial Plan =="
    # section — analyze only the final plan
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "scans": plan.count("Scan parquet") + plan.count("Scan orc"),
        "shuffles": plan.count("Exchange hashpartitioning"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\)", plan))
        ),
        "generates": plan.count("Generate "),
        "sorts": plan.count("Sort "),
        "cartesian": "CartesianProduct" in plan,
        "python_row_eval": "BatchEvalPython" in plan,
        "arrow_eval": "ArrowEvalPython" in plan or "MapInPandas" in plan,
        "scan_columns": [
            sorted(c.split(":")[0] for c in s.split(",") if c) for s in scans
        ],
    }
