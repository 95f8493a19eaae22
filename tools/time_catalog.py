"""Spark-side timing sweep of EVERY catalog query — the outlier finder,
now also the PERF GATE.

Runs each `queries()` entry at the given sf dir (default sf0.1), counts
once cold and once warm, and prints one JSON line per query plus a
sorted slowest-first summary. No DuckDB side, so sf0.1 finishes in
minutes (the oracle-joined gate is tools/check_correctness.py).

This sweep found the round-6 outliers the headline bench never sees:
the AQE byte-coalescing serialization of grouped-python panels, the
HOF expression-inlining quadratic re-tokenize, and the interpreted
all-pairs embedding screen (SCALING.md has the write-ups). Round 7
froze that win: per-query warm budgets live in
``tools/catalog_budgets.json`` and ``--check`` fails any query that
runs slower than ``BUDGET_FACTOR x`` its budget (above a jitter floor),
so the next AQE/HOF-class regression is caught mechanically instead of
by a hand sweep.

Usage:
    python tools/time_catalog.py [sf_dir] [top_n]     # plain sweep
    python tools/time_catalog.py --check [sf_dir]     # gate vs budgets
    python tools/time_catalog.py --write-budgets [sf_dir]
                                                      # (re)write ALL budgets
    python tools/time_catalog.py --update-budgets [sf_dir]
                                                      # add budgets for NEW
                                                      # queries only

Gate rules (--check):
  * FAIL if warm > BUDGET_FACTOR (2x) x drift x budget AND warm >=
    JITTER_FLOOR x drift (0.35 s base — below that, local[32]
    scheduling noise dominates). ``drift`` = the median warm/budget
  * TWO-STRIKE (round 9): a query that trips the threshold is RE-TIMED
    at the end of the sweep (same JVM, still warm, fresh DataFrame) and
    fails only if the re-time trips it AGAIN. Evidence: back-to-back
    clean-code sweeps in round 8 flagged four DIFFERENT sub-second
    queries (ts_ewma_bands 2.6x, then a_histogram_quantiles 2.5x /
    a_hll_cardinality 2.3x / dq_ref_integrity 2.1x) — all disjoint,
    all noise. A single sub-second sample on local[32] is not a
    measurement; two independent trips of the same 2x bar are. Cleared
    flags are reported (and recorded in --json as first_strike_cleared)
    so a chronically-flaky query is still visible.
    ratio over the whole catalog, clamped >= 1: the same box can run
    everything 1.5-2x slower hours later (thermal/cache state), which
    would false-flag untouched queries; a REAL regression moves one
    query's ratio, not the median, so normalizing by the median keeps
    the gate sharp while ignoring uniform machine drift. (Observed
    live in round 7: two untouched queries flagged 2-3x over; an A/B
    at the last-clean commit timed identically — pure machine state.)
  * Normalization is CAPPED at DRIFT_CAP (1.5x): above it the gate
    FAILS CLOSED without normalizing — it cannot distinguish a severe
    machine window from a shared-kernel regression that slowed most of
    the catalog, and normalizing would mask the latter. The failure
    message says so; the remedy is a quiet-machine re-run, then a git
    worktree A/B at the last-clean commit if drift persists. The JSON
    payload keeps the normal schema with drift_exceeded=true (errored
    queries stay visible).
  * FAIL if a query errors.
  * FAIL if a query has no budget (run --update-budgets after adding a
    catalog row; it never loosens an existing budget).
  * Queries REMOVED from the catalog but still budgeted are reported,
    not failed (stale entries are cleaned by --write-budgets).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGETS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "catalog_budgets.json")
BUDGET_FACTOR = 2.0
JITTER_FLOOR = 0.35  # seconds — under this, scheduler noise dominates
DRIFT_CAP = 1.5  # above this, the gate refuses to normalize (see --check)


def _sweep(sf_dir: str, keep_session: bool = False):
    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    spark = get_spark(app_name="catalog-times")
    out: dict[str, tuple[float, float]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.count()
            cold = time.time() - t0
            t0 = time.time()
            df.count()
            warm = time.time() - t0
            # MEDIAN-OF-3 for fast rows (round 13): a single warm
            # sample under 2x the jitter floor is scheduler noise as
            # often as signal (the r12 cold-spike probe measured +-40%
            # single-sample swing on sub-0.5s rows; 13 first-strikes in
            # one r12 sweep, all retime-cleared). Two extra warm counts
            # and the median make one hiccup unable to flag the row —
            # applied in EVERY mode so budgets and checks share the
            # same statistic. Slow rows keep the single sample (their
            # relative noise is small and 2 extra counts are costly).
            if warm < 2 * JITTER_FLOOR:
                samples = [warm]
                for _ in range(2):
                    t0 = time.time()
                    df.count()
                    samples.append(time.time() - t0)
                warm = sorted(samples)[1]
            out[name] = (round(cold, 3), round(warm, 3))
            print(json.dumps({"q": name, "cold": out[name][0], "warm": out[name][1]}), flush=True)
        except Exception as exc:  # a failing build is the headline result
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
            print(json.dumps({"q": name, "err": errs[name]}), flush=True)
        spark.catalog.clearCache()
    if keep_session:
        return out, errs, spark
    spark.stop()
    return out, errs, None


def _retime(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    """Second strike: re-time each flagged query in the SAME still-warm
    JVM, fresh DataFrame (cold count populates internal persists, warm
    count is the measurement — same protocol as the sweep)."""
    import __spark_entry__ as E

    qs = E.queries()
    res: dict[str, float] = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            df.count()
            t0 = time.time()
            df.count()
            warm = time.time() - t0
            # same median-of-3 protocol as the sweep for fast rows
            if warm < 2 * JITTER_FLOOR:
                samples = [warm]
                for _ in range(2):
                    t0 = time.time()
                    df.count()
                    samples.append(time.time() - t0)
                warm = sorted(samples)[1]
            res[name] = round(warm, 3)
        except Exception:
            res[name] = float("inf")
        spark.catalog.clearCache()
    return res


def _flagged(
    out_warm: dict[str, float], budgets: dict[str, float], drift: float
) -> tuple[list[tuple[str, float, float]], list[str]]:
    """Pure gate predicate: (over-budget [(name, warm, budget)],
    unbudgeted [name]) at the given machine-drift factor. Extracted so
    the two-strike logic is unit-testable without Spark."""
    over, missing = [], []
    for name, warm in out_warm.items():
        b = budgets.get(name)
        if b is None:
            missing.append(name)
        elif warm >= JITTER_FLOOR * drift and warm > BUDGET_FACTOR * drift * max(
            b, JITTER_FLOOR / BUDGET_FACTOR
        ):
            over.append((name, warm, b))
    return over, missing


def two_strike(
    first_over: list[tuple[str, float, float]],
    retimes: dict[str, float],
    budgets: dict[str, float],
    drift: float,
) -> tuple[list[tuple[str, float, float, float]], list[tuple[str, float, float, float]]]:
    """Split first-strike flags into (confirmed, cleared) using the
    re-timed warm values: a flag is CONFIRMED only if the re-time trips
    the same threshold again. Entries are (name, warm1, warm2, budget)."""
    second, _ = _flagged({n: retimes.get(n, float("inf")) for n, _, _ in first_over}, budgets, drift)
    confirmed_names = {n for n, _, _ in second}
    confirmed, cleared = [], []
    for name, warm1, b in first_over:
        rec = (name, warm1, retimes.get(name, float("inf")), b)
        (confirmed if name in confirmed_names else cleared).append(rec)
    return confirmed, cleared


def _load_budgets() -> dict[str, float]:
    if not os.path.exists(BUDGETS_PATH):
        return {}
    with open(BUDGETS_PATH) as f:
        doc = json.load(f)
    return {k: float(v) for k, v in doc.get("budgets_warm_s", {}).items()}


def _save_budgets(budgets: dict[str, float], sf_dir: str) -> None:
    doc = {
        "_comment": (
            "Per-query WARM-run budgets (seconds) from tools/time_catalog.py "
            f"at {sf_dir} on local[32]. --check fails any query above "
            f"{BUDGET_FACTOR}x its budget (jitter floor {JITTER_FLOOR}s). "
            "Regenerate with --write-budgets only after verifying a slowdown "
            "is intentional; --update-budgets adds new queries without "
            "loosening existing entries."
        ),
        "sf_dir": sf_dir,
        "budgets_warm_s": dict(sorted(budgets.items())),
    }
    with open(BUDGETS_PATH, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    mode = "sweep"
    for flag, m in (("--check", "check"), ("--write-budgets", "write"), ("--update-budgets", "update")):
        if flag in args:
            mode = m
            args.remove(flag)
    # (median-of-3 sampling below needs no flag: it is part of the
    # measurement protocol for every mode so budgets and checks see
    # the same statistic)
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("--json needs a file path")
            return 2
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    top_n = int(args[1]) if len(args) > 1 else 15
    if json_out and mode != "check":
        print("--json only applies to --check; ignoring")
        json_out = None

    out, errs, spark = _sweep(sf_dir, keep_session=(mode == "check"))

    total = sum(w for _, w in out.values())
    print(f"\n{len(out)} timed, {len(errs)} errored; total warm {total:.1f}s")
    for name, (cold, warm) in sorted(out.items(), key=lambda kv: -kv[1][1])[:top_n]:
        print(f"{name:40s} cold {cold:7.2f}  warm {warm:7.2f}")
    for name, e in errs.items():
        print(f"ERROR {name}: {e}")

    if mode == "write":
        _save_budgets({k: w for k, (_, w) in out.items()}, sf_dir)
        print(f"wrote {len(out)} budgets -> {BUDGETS_PATH}")
        return 1 if errs else 0

    if mode == "update":
        budgets = _load_budgets()
        new = {k: w for k, (_, w) in out.items() if k not in budgets}
        budgets.update(new)
        _save_budgets(budgets, sf_dir)
        print(f"added {len(new)} new budgets ({len(budgets)} total) -> {BUDGETS_PATH}")
        return 1 if errs else 0

    if mode == "check":
        budgets = _load_budgets()
        if not budgets:
            print(f"NO BUDGET FILE at {BUDGETS_PATH} — run --write-budgets first")
            if spark is not None:
                spark.stop()
            return 1
        # MACHINE-DRIFT NORMALIZATION: budgets were recorded under one
        # machine state; hours later the same box can run every query
        # 1.5-2x slower (thermal/cache/cgroup), which would false-flag
        # untouched queries. The median warm/budget ratio across the
        # catalog estimates that uniform drift (a real regression moves
        # ONE query, not the median); thresholds scale by max(1, drift).
        ratios = sorted(
            out[n][1] / b
            for n, b in budgets.items()
            if n in out and b > 0 and out[n][1] >= JITTER_FLOOR / 2
        )
        if ratios:
            mid = len(ratios) // 2
            med = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
        else:
            med = 1.0
        drift = max(1.0, med)
        if drift > DRIFT_CAP and spark is not None:
            spark.stop()
            spark = None
        if drift > DRIFT_CAP:
            # refusing to normalize: either the box is in a severely
            # slow window (re-run when quiet) or a shared-kernel
            # regression moved MOST of the catalog — normalizing here
            # would let a catalog-wide 2x slowdown pass the gate.
            print(
                f"\nDRIFT {drift:.2f} EXCEEDS CAP {DRIFT_CAP} — not "
                "normalizing. Re-run on a quiet machine; if drift "
                "persists, suspect a shared-kernel regression (A/B at "
                "the last-clean commit via a git worktree)."
            )
            if json_out:
                stale = sorted(set(budgets) - set(out) - set(errs))
                with open(json_out, "w") as f:
                    json.dump(
                        {
                            "sf_dir": sf_dir,
                            "n_queries": len(out),
                            "total_warm_s": round(total, 1),
                            "budget_factor": BUDGET_FACTOR,
                            "jitter_floor_s": JITTER_FLOOR,
                            "machine_drift": round(drift, 3),
                            "drift_exceeded": True,
                            "pass": False,
                            "over_budget": [],
                            "unbudgeted": sorted(
                                n for n in out if n not in budgets
                            ),
                            "errored": sorted(errs),
                            "stale_budgets": stale,
                            "warm_s": {k: w for k, (_, w) in sorted(out.items())},
                        },
                        f,
                        indent=1,
                    )
                    f.write("\n")
                print(f"wrote {json_out}")
            return 1
        first_over, missing = _flagged(
            {k: w for k, (_, w) in out.items()}, budgets, drift
        )
        confirmed, cleared = [], []
        if first_over:
            # second strike: re-time only the flagged queries while the
            # JVM is still warm; fail only flags that reproduce
            names = [n for n, _, _ in first_over]
            print(f"\nfirst strike: {len(names)} flagged — re-timing {names}")
            retimes = _retime(spark, sf_dir, names)
            confirmed, cleared = two_strike(first_over, retimes, budgets, drift)
        if spark is not None:
            spark.stop()
        stale = sorted(set(budgets) - set(out) - set(errs))
        print(f"\n--check vs {len(budgets)} budgets "
              f"(machine drift x{drift:.2f}): "
              f"{len(confirmed)} over-budget (two-strike confirmed), "
              f"{len(cleared)} flake-cleared, {len(missing)} unbudgeted, "
              f"{len(errs)} errored, {len(stale)} stale-budget")
        for name, w1, w2, b in sorted(confirmed, key=lambda t: -(t[2] / t[3])):
            print(f"OVER   {name:40s} warm {w1:7.2f}s retime {w2:7.2f}s "
                  f"budget {b:7.2f}s  ({w2/b:.1f}x)")
        for name, w1, w2, b in cleared:
            print(f"cleared {name:39s} warm {w1:7.2f}s retime {w2:7.2f}s "
                  f"budget {b:7.2f}s (first strike only — noise)")
        for name in missing:
            print(f"NOBUDGET {name} — run --update-budgets")
        for name in stale:
            print(f"stale budget (query gone): {name}")
        ok = not (confirmed or missing or errs)
        if json_out:
            with open(json_out, "w") as f:
                json.dump(
                    {
                        "sf_dir": sf_dir,
                        "n_queries": len(out),
                        "total_warm_s": round(total, 1),
                        "budget_factor": BUDGET_FACTOR,
                        "jitter_floor_s": JITTER_FLOOR,
                        "machine_drift": round(drift, 3),
                        "drift_exceeded": False,
                        "pass": ok,
                        # first-strike TREND input (round 13): flag
                        # count per round, quoted by tools/perf_trend.py
                        "n_first_strikes": len(first_over),
                        "over_budget": [
                            {"q": n, "warm": w1, "retime": w2, "budget": b}
                            for n, w1, w2, b in confirmed
                        ],
                        "first_strike_cleared": [
                            {"q": n, "warm": w1, "retime": w2, "budget": b}
                            for n, w1, w2, b in cleared
                        ],
                        "unbudgeted": missing,
                        "errored": sorted(errs),
                        "stale_budgets": stale,
                        "warm_s": {k: w for k, (_, w) in sorted(out.items())},
                    },
                    f,
                    indent=1,
                )
                f.write("\n")
            print(f"wrote {json_out}")
        return 0 if ok else 1

    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
