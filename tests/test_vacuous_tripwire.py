"""Pin for the r12 vacuous-oracle tripwire (r12 verdict ask #3).

r10 shipped three FULL-oracle queries whose Spark AND DuckDB sides
both returned 0 rows — a 0-row frame hash-matches a 0-row frame no
matter how wrong the query logic is, so the sweep reported them green.
r11 de-vacuated them by hand; r12 makes recurrence impossible:
``tools.check_correctness.compare_entry`` FAILS any full-oracle query
returning 0 rows on both sides unless it is on the explicit
``EXPECTED_EMPTY`` whitelist.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "repo")
)
sys.path.insert(0, "/root/repo")

from tools.check_correctness import (  # noqa: E402
    EXPECTED_EMPTY,
    compare_entry,
    frame_hash,
)


def _hash_of(rows, cols):
    import pandas as pd

    return frame_hash(pd.DataFrame(rows, columns=cols))


def test_deliberately_emptied_query_fails():
    h = _hash_of([], ["x"])
    entry, why = compare_entry("some_query", h, h)
    assert entry["vacuous"] is True
    assert why is not None and "vacuous" in why


def test_whitelisted_empty_query_passes():
    h = _hash_of([], ["x"])
    entry, why = compare_entry(
        "known_empty", h, h, expected_empty={"known_empty"}
    )
    assert why is None
    assert "vacuous" not in entry


def test_nonempty_match_still_passes():
    h = _hash_of([(1, "a"), (2, "b")], ["i", "t"])
    entry, why = compare_entry("q", h, h)
    assert why is None
    assert entry["hash_match"] and entry["rows_match"]


def test_real_mismatches_still_fail_before_vacuous_check():
    hs = _hash_of([(1,)], ["x"])
    ho = _hash_of([(2,)], ["x"])
    entry, why = compare_entry("q", hs, ho)
    assert why is not None and "hash mismatch" in why

    hs2 = _hash_of([], ["x"])
    ho2 = _hash_of([(1,)], ["x"])
    _, why2 = compare_entry("q", hs2, ho2)
    assert why2 is not None and "rowcount" in why2


def test_whitelist_is_intentionally_empty_today():
    # every current full-oracle catalog row returns rows at sf0.01; a
    # future genuinely-empty query must be added HERE with a reason,
    # which makes the whitelist auditable
    assert EXPECTED_EMPTY == set()
