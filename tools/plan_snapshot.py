"""Plan-signature snapshots: the physical-plan regression harness.

For every bench headline query, record a structural signature of the
executed plan at sf0.001 — operator counts that encode the scale
contract (exchanges, broadcast vs sort-merge joins, explodes, scans).
`tests/test_plan_snapshots.py` compares live plans against the
committed snapshot, so an edit that silently turns a broadcast join
into a shuffled one, or doubles a corpus explode, fails CI even though
results stay correct.

Usage:
    python tools/plan_snapshot.py            # refresh plans/SNAPSHOTS.json
    python tools/plan_snapshot.py --check    # exit 1 on drift
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "azuredataengineering_deeplearning_spark", "plans", "SNAPSHOTS.json",
)

# the operators whose counts define the scale contract
MARKERS = [
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Generate",
    "Scan parquet",
    "Window",
    "TakeOrderedAndProject",
    "InMemoryRelation",
]


def _strip_cached_children(plan: str) -> str:
    """Drop every subtree printed BELOW an ``InMemoryRelation`` line.

    A cached relation's child plan is re-printed textually at every
    consumer site, and its printed form depends on runtime state (how
    many consumers, whether the cache materialized, AQE initial vs
    final) — r14 found the full-suite test order flipping
    pipeline_curate_corpus's counts (10 vs 14 exchanges) purely through
    this re-printing, with the logical plan identical. The signature
    therefore counts the query's OWN uncached shape and counts each
    `InMemoryRelation` occurrence as an atomic marker: a change in what
    gets pinned still drifts, while print-multiplicity of the pinned
    subtree cannot."""
    out: list[str] = []
    skip_deeper_than: int | None = None
    for ln in plan.split("\n"):
        stripped = ln.lstrip(" :+-")
        depth = len(ln) - len(stripped)
        if skip_deeper_than is not None:
            if depth > skip_deeper_than:
                continue
            skip_deeper_than = None
        out.append(ln)
        if "InMemoryRelation" in ln:
            skip_deeper_than = depth
    return "\n".join(out)


def signature(plan: str) -> dict[str, int]:
    plan = _strip_cached_children(plan)
    return {m: plan.count(m) for m in MARKERS if plan.count(m)}


def main() -> None:
    check = "--check" in sys.argv

    import bench
    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    # MUST match tests/conftest.py's fixture config (master local[8],
    # shuffle_partitions=8): plans that embed eagerly-checkpointed
    # frames (curate-corpus' near-dup pair list) inherit the partition
    # count AQE coalesced them to under the session's parallelism, and
    # that toggles downstream SinglePartition exchanges — snapshots are
    # only comparable under the exact session config the test uses.
    os.environ["SPARK_GRAFT_CPUS"] = "8"
    spark = get_spark(app_name="plan-snapshot", shuffle_partitions=8)
    qs = E.queries()
    sigs: dict[str, dict[str, int]] = {}
    for name in bench.HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        sigs[name] = signature(plan)

    if check:
        with open(OUT) as f:
            want = json.load(f)
        drift = {
            n: {"want": want.get(n), "got": s}
            for n, s in sigs.items()
            if want.get(n) != s
        }
        if drift:
            print(json.dumps({"plan_drift": drift}, indent=2))
            sys.exit(1)
        print(f"{len(sigs)} plan signatures match")
        return

    with open(OUT, "w") as f:
        json.dump(sigs, f, indent=2, sort_keys=True)
    print(f"wrote {len(sigs)} signatures to {OUT}")


if __name__ == "__main__":
    main()
