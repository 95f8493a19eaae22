"""Unit tests of the perf-gate decision logic in tools/time_catalog.py
(pure functions — no Spark). Pins the round-9 two-strike behavior: a
first-strike flag that does NOT reproduce on the re-time is cleared
(reported, not failed); one that reproduces is confirmed."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "time_catalog",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "time_catalog.py"),
)
tc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tc)


BUDGETS = {"fast_q": 0.2, "slow_q": 2.0, "mid_q": 0.5}


def test_flagged_respects_jitter_floor_and_factor():
    warm = {"fast_q": 0.3, "slow_q": 2.5, "mid_q": 1.2}
    over, missing = tc._flagged(warm, BUDGETS, drift=1.0)
    # fast_q: 0.3 < JITTER_FLOOR (0.35) -> never flagged even at 1.5x
    # slow_q: 2.5 < 2x budget -> not flagged
    # mid_q: 1.2 > 2x 0.5 and above floor -> flagged
    assert [n for n, _, _ in over] == ["mid_q"]
    assert missing == []


def test_flagged_reports_unbudgeted():
    over, missing = tc._flagged({"new_q": 0.1}, BUDGETS, drift=1.0)
    assert missing == ["new_q"]
    assert over == []


def test_flagged_scales_thresholds_by_drift():
    warm = {"mid_q": 1.2}
    over, _ = tc._flagged(warm, BUDGETS, drift=1.3)
    # threshold becomes 2 x 1.3 x 0.5 = 1.3 > 1.2 -> drift absorbs it
    assert over == []


def test_two_strike_clears_noise_flag():
    # injected-noise scenario: first strike 2.5x over, re-time back
    # under budget -> cleared, not confirmed
    first = [("mid_q", 1.25, 0.5)]
    confirmed, cleared = tc.two_strike(
        first, {"mid_q": 0.48}, BUDGETS, drift=1.0
    )
    assert confirmed == []
    assert cleared == [("mid_q", 1.25, 0.48, 0.5)]


def test_two_strike_confirms_real_regression():
    first = [("mid_q", 1.25, 0.5), ("slow_q", 8.0, 2.0)]
    confirmed, cleared = tc.two_strike(
        first, {"mid_q": 0.4, "slow_q": 7.9}, BUDGETS, drift=1.0
    )
    assert [c[0] for c in confirmed] == ["slow_q"]
    assert [c[0] for c in cleared] == ["mid_q"]


def test_two_strike_errored_retime_is_confirmed():
    # a query that ERRORS on the re-time (inf) must not be cleared
    first = [("mid_q", 1.25, 0.5)]
    confirmed, cleared = tc.two_strike(first, {}, BUDGETS, drift=1.0)
    assert [c[0] for c in confirmed] == ["mid_q"]
    assert cleared == []
