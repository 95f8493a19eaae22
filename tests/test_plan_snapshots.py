"""Physical-plan regression guard: every headline query's plan
signature (exchange/broadcast/explode/scan counts) must match the
committed snapshot. Refresh intentionally via
`python tools/plan_snapshot.py` when a plan change is deliberate."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import bench  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from plan_snapshot import OUT, SF_DIR, signature  # noqa: E402


def test_headline_plan_signatures_unchanged(spark):
    spark.catalog.clearCache()  # plans must not depend on test-order cache state
    with open(OUT) as f:
        want = json.load(f)
    qs = E.queries()
    drift = {}
    for name in bench.HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        if want.get(name) != signature(plan):
            drift[name] = {"want": want.get(name), "got": signature(plan)}
    assert not drift, json.dumps(drift, indent=2)
