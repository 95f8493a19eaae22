"""Dump `.explain("formatted")` for named catalog queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: every
bench.py HEADLINE row). Plan generation only — nothing is executed, so
this is safe to run alongside other work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    import __spark_entry__ as E
    from azuredataengineering_deeplearning_spark import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    qs = E.queries()
    spark = get_spark(app_name="ades-plan-dump")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not in catalog", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
