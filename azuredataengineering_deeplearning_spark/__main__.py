"""Command-line front door: run a KQL pipe or a SQL statement against
a testdata directory's star schema and print the result.

    python -m azuredataengineering_deeplearning_spark "events | take 5"
    python -m azuredataengineering_deeplearning_spark \
        --sql "SELECT count(*) FROM orders" --sf /root/testdata/sf0.01
    python -m azuredataengineering_deeplearning_spark --list-queries

KQL is the default dialect (the reference's ``kusto_query.py`` /
``daily_eval.py`` entry shape); ``--sql`` switches to Spark SQL over
the registered views. ``--query NAME`` runs a catalog query by name.
Output: ``--show`` (default, truncated table), ``--csv`` (full, to
stdout), ``--json`` (one JSON object per line)."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None, spark=None) -> int:
    """CLI entry. ``spark``: inject an existing SparkSession (tests);
    when injected the session is NOT stopped on exit."""
    ap = argparse.ArgumentParser(
        prog="python -m azuredataengineering_deeplearning_spark",
        description="Run a KQL pipe / SQL statement / catalog query "
        "against a testdata star schema.",
    )
    ap.add_argument("pipe", nargs="?", help="KQL pipe (tables by name)")
    ap.add_argument("--sql", help="Spark SQL over the registered views")
    ap.add_argument("--query", help="catalog query name (see --list-queries)")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR"),
        help="testdata directory (default: $SPARK_GRAFT_SF_DIR)",
    )
    ap.add_argument("--limit", type=int, default=20, help="--show row cap")
    ap.add_argument("--csv", action="store_true", help="full CSV to stdout")
    ap.add_argument("--json", action="store_true", help="JSON lines to stdout")
    ap.add_argument(
        "--list-queries", action="store_true", help="list catalog queries"
    )
    args = ap.parse_args(argv)

    if args.list_queries:
        import __spark_entry__ as E

        for name in sorted(E.queries()):
            print(name)
        return 0

    modes = sum(x is not None for x in (args.pipe, args.sql, args.query))
    if modes != 1:
        ap.error("give exactly one of: a KQL pipe, --sql, or --query NAME")
    if not args.sf:
        ap.error("--sf is required (or set $SPARK_GRAFT_SF_DIR)")

    from azuredataengineering_deeplearning_spark import get_spark
    from azuredataengineering_deeplearning_spark.sources.readers import (
        load_tables,
        register_views,
    )

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="ades-cli")
    try:
        if args.query:
            import __spark_entry__ as E

            qs = E.queries()
            if args.query not in qs:
                print(f"unknown catalog query {args.query!r}", file=sys.stderr)
                return 2
            df = qs[args.query](spark, args.sf)
        elif args.sql:
            register_views(spark, args.sf)
            df = spark.sql(args.sql)
        else:
            from azuredataengineering_deeplearning_spark.sources.kql import (
                _split_pipe,
                kql_fork,
                kql_to_df,
            )

            try:
                stages = _split_pipe(args.pipe.strip())
                if any(
                    s.split(None, 1)[0] == "fork" for s in stages if s
                ):
                    # fork yields one table PER BRANCH — print each
                    # with a name header (Kusto clients show multiple
                    # result grids for the same reason)
                    branches = kql_fork(load_tables(spark, args.sf), args.pipe)
                    for name, bdf in branches.items():
                        print(f"-- fork branch: {name} --")
                        _emit(bdf, args)
                    return 0
                df = kql_to_df(load_tables(spark, args.sf), args.pipe)
            except (ValueError, KeyError) as e:
                print(f"KQL error: {e}", file=sys.stderr)
                return 2
        _emit(df, args)
        return 0
    finally:
        if owns_session:
            spark.stop()


def _emit(df, args) -> None:
    """Print one result frame in the selected output mode."""
    import sys

    if args.csv:
        import csv

        w = csv.writer(sys.stdout)
        w.writerow(df.columns)
        for row in df.toLocalIterator():
            w.writerow(list(row))
    elif args.json:
        import json

        for row in df.toLocalIterator():
            print(json.dumps(row.asDict(), default=str))
    else:
        df.show(args.limit, truncate=False)


if __name__ == "__main__":
    raise SystemExit(main())
