"""Plan lint: build EVERY catalog query's physical plan at sf0.001 and
flag scale anti-patterns — CartesianProduct, BroadcastNestedLoopJoin,
row-at-a-time Python UDFs (BatchEvalPython; Arrow-batched pandas
UDFs show as ArrowEvalPython and are allowed), and UNPARTITIONED
WINDOWS (a ``Window`` operator with an empty partition spec funnels the
whole frame through one task — the bug class behind the rfm_segments /
factorize fixes; the distributed alternatives are ``global_row_number``
/ ``global_ntile`` / ``_ordered_running_sums``). Documented exceptions
live in WHITELIST / UNPART_WINDOW_OK with the reason. Analysis only (no
execution), so the whole catalog lints in a few minutes.

Usage: python tools/plan_lint.py            # prints violations, exit 1 if any
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> (patterns allowed, why)
WHITELIST = {
    # documented exact baseline: broadcast(queries) x corpus scan
    "sim_cosine_topk": ("BroadcastNestedLoopJoin", "exact brute-force baseline; pruned twins registered"),
    "sim_numpy_topk": ("BroadcastNestedLoopJoin", "exact numpy baseline"),
    # D1 is the row-UDF *exhibit* with a native twin + equivalence test
    "d1_json_array_flatten": ("BatchEvalPython", "reference row-UDF exhibit; native twin tested"),
    # BNLJ over frames that are BOUNDED BY CONSTRUCTION on both sides
    # (aggregated O(bins)/O(classes)/O(candidates) tables, not raw data):
    "a_histogram_quantiles": ("BroadcastNestedLoopJoin", "O(bins) histogram x O(probs) range join"),
    "a_grouped_histogram_quantiles": ("BroadcastNestedLoopJoin", "O(groups*bins) x O(probs)"),
    "a_cramers_v": ("BroadcastNestedLoopJoin", "contingency marginals x 1-row total"),
    "kql_basket": ("BroadcastNestedLoopJoin", "O(itemsets) frame x 1-row grand-total denominator"),
    "a_ks_two_sample": ("BroadcastNestedLoopJoin", "two O(distinct-value) CDF frames"),
    "a_mutual_information": ("BroadcastNestedLoopJoin", "contingency x marginal frames"),
    "dedup_simhash_pairs": ("BroadcastNestedLoopJoin", "prefix-blocked sketch table, bounded bands"),
    "sim_hamming_topk": ("BroadcastNestedLoopJoin", "broadcast query codes x corpus codes (integer stage, documented)"),
    "sim_rerank_two_stage": ("BroadcastNestedLoopJoin", "stage-2 re-rank over bounded stage-1 candidates"),
    "t_unigram_drift": ("BroadcastNestedLoopJoin", "two bounded vocab count tables"),
    "t_unigram_xent": ("BroadcastNestedLoopJoin", "bounded LM vocab table attach"),
    "t_bigram_xent": ("BroadcastNestedLoopJoin", "bounded bigram LM table attach"),
    "t_dsir_scores": ("BroadcastNestedLoopJoin", "O(hash-buckets) importance tables"),
    "t_dsir_select": ("BroadcastNestedLoopJoin", "same tables as t_dsir_scores"),
    "t_pmi_collocations": ("BroadcastNestedLoopJoin", "bounded unigram/bigram count frames"),
    "t_tfidf_topk": ("BroadcastNestedLoopJoin", "bounded df table attach"),
    "t_bm25_topk": ("BroadcastNestedLoopJoin", "bounded df/avgdl stats attach"),
    "t_span_dedup": ("BroadcastNestedLoopJoin", "bounded common-span table"),
    "ts_activity_heatmap": ("BroadcastNestedLoopJoin", "O(cells) heatmap x 1-row total"),
    "dq_benford": ("BroadcastNestedLoopJoin", "9-row expected-digit table"),
    "ml_class_weights": ("BroadcastNestedLoopJoin", "O(classes) weights x 1-row total"),
    "ml_lift_table": ("BroadcastNestedLoopJoin", "O(deciles) x 1-row base rate"),
    "prof_key_skew": ("BroadcastNestedLoopJoin", "O(keys-profile) x 1-row stats"),
    "q11_important_stock": ("BroadcastNestedLoopJoin", "TPC-H scalar HAVING threshold"),
    "q22_inactive_customers": ("BroadcastNestedLoopJoin", "TPC-H scalar AVG subquery"),
    "recsys_negative_sample": ("BroadcastNestedLoopJoin", "1-row item-bound attach"),
}

BAD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

# Queries allowed to run a Window with NO partition keys, each with the
# reason the frame feeding it is BOUNDED BY CONSTRUCTION (an aggregate
# of O(bins)/O(classes)/O(partitions) rows, or post-limit) — a global
# window over a bounded frame is one small task, not a scale hazard.
# Anything else that orders/aggregates an unbounded frame through an
# unpartitioned window is a violation: use global_row_number /
# global_ntile / _ordered_running_sums instead.
UNPART_WINDOW_OK: dict[str, str] = {
    "a_histogram_quantiles": "cumsum over the O(bins) merged histogram frame",
    "a_grouped_histogram_quantiles": "cumsum over O(groups*bins) histogram frame",
    "ml_lift_table": "cumulative-capture over the O(buckets) tier aggregate "
    "(per-row tiering itself is distributed via global_ntile)",
    "prof_key_skew": "rank over the post-limit O(top_n) heavy-hitter frame",
    "ts_period_growth": "lag over the O(periods) per-period aggregate",
    "w2_hotkey_cumsum_plain": "documented exhibit of the unsalted hazard; "
    "w2_hotkey_cumsum_salted is the fix",
    "w2_hotkey_cumsum_salted": "second-level window over O(salt-buckets) totals",
}


def unpartitioned_windows(plan: str) -> list[str]:
    """Return the ``Window`` operator lines whose partition spec is
    empty. Physical format: ``Window [exprs], [partSpec], [orderSpec]``
    — three top-level bracket groups when partitioned; one or two when
    the partition spec is empty (global window)."""
    hits = []
    for line in plan.splitlines():
        s = line.lstrip(" :+-*")
        if not (s.startswith("Window ") or s.startswith("WindowGroupLimit ")):
            continue
        if s.startswith("WindowGroupLimit "):
            # rank-filter pushdown: runs PARTIAL before the shuffle, so a
            # global one is a parallel top-k, not a single-task funnel
            continue
        depth = 0
        groups: list[str] = []
        buf: list[str] = []
        for ch in s:
            if ch == "[":
                if depth == 0:
                    buf = []
                depth += 1
                if depth == 1:
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                    continue
            if depth >= 1:
                buf.append(ch)
        if len(groups) >= 3:
            continue  # [exprs], [partSpec], [orderSpec] — partitioned
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # [exprs], [partSpec] — partitioned, unordered frame
        # [exprs] alone, or [exprs], [orderSpec]: no partition keys
        hits.append(s[:160])
    return hits


def _indent(line: str) -> int:
    i = 0
    while i < len(line) and line[i] in " :+-*(0123456789)":
        i += 1
    return i


def bnlj_is_scalar_attach(plan: str) -> bool:
    """True if EVERY BroadcastNestedLoopJoin in the plan broadcasts a
    global (keys=[]) aggregate — the 1-row scalar-attach pattern
    (crossJoin(broadcast(agg)) / scalar subquery), which is fine at any
    scale. A BNLJ whose build side is a real relation returns False."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        depth = _indent(line)
        subtree = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and _indent(nxt) <= depth and any(
                op in nxt for op in ("Scan", "Join", "Aggregate", "Project",
                                     "Exchange", "Filter", "Sort", "Window")
            ):
                break
            subtree.append(nxt)
        if not any("keys=[]" in s for s in subtree):
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    spark = get_spark(app_name="plan-lint")
    qs = E.queries()
    violations: dict[str, list[str]] = {}
    built = 0
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # build failure is its own violation
            violations[name] = [f"plan build failed: {type(exc).__name__}: {exc}"[:200]]
            continue
        built += 1
        allowed = WHITELIST.get(name, ("", ""))[0]
        hits = []
        for b in BAD:
            if b not in plan or b == allowed:
                continue
            if b == "BroadcastNestedLoopJoin" and bnlj_is_scalar_attach(plan):
                continue  # broadcast-1-row scalar attach: documented clean pattern
            hits.append(b)
        if name not in UNPART_WINDOW_OK:
            for wline in unpartitioned_windows(plan):
                hits.append(f"UnpartitionedWindow: {wline}")
        if hits:
            violations[name] = hits
    print(f"linted {built}/{len(qs)} plans")
    for name, hits in sorted(violations.items()):
        print(f"VIOLATION {name}: {hits}")
    if not violations:
        print("clean: no cartesian / nested-loop / row-UDF plans outside the whitelist")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
