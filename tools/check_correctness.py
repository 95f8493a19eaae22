"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every catalog query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, then compares row count, sorted column names, and an
order-insensitive canonical value hash (doubles rounded to 6 decimals,
timestamps ISO-8601, NULL as a token). Queries with no oracle get a
rows-only check.

Usage: python tools/check_correctness.py [--json out.json] [sf_dir] [query_name ...]

``--json`` additionally writes a per-query result map in the driver's
CORRECTNESS_r{N}.json shape, so a full local sweep can be committed as
a reproducible self-check artifact.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Schema contracts for the rows-only queries (no DuckDB oracle by
# design — seeded Spark RNG / model-bound / recall-bound). The sweep
# still asserts the exact output schema (name -> Spark dtype) and a
# non-empty result, so SELFCHECK records more than `rows_only: true`
# for them (r8 verdict ask #4). Row COUNTS are sf-dependent and stay
# with the per-query pytest invariants.
ROWS_ONLY_CONTRACTS: dict[str, dict[str, str]] = {
    "d11_cluster_assign": {"vec_id": "bigint", "cluster": "int", "strength": "double"},
    "d2_embed_pandas_udf": {
        "doc_id": "bigint", "dim": "int", "l2_norm": "double",
        "comp_sum": "double", "comp_max": "double",
    },
    "ml_rf_train_score": {"predicted_label": "string", "n": "bigint"},
    "sim_ann_ivf_topk": {
        "query_id": "bigint", "neighbor_id": "bigint", "cos": "double", "rank": "int",
    },
    "sim_ann_lsh_topk": {
        "query_id": "bigint", "neighbor_id": "bigint", "cos": "double", "rank": "int",
    },
    "sim_ivfpq_topk": {
        "query_id": "bigint", "neighbor_id": "bigint", "adc_score": "double",
    },
    "sim_pq_adc_topk": {
        "query_id": "bigint", "neighbor_id": "bigint", "adc_score": "double",
    },
    # sim_semantic_dedup graduated to FULL ORACLE in r13 (deterministic
    # sign-LSH blocking variant; the fitted-k-means variant stays
    # pytest-covered) — r12 verdict ask #6
    "u4_sample_fraction": {"o_orderkey": "bigint"},
    "u5_mixture_sample": {"o_orderkey": "bigint", "o_orderstatus": "string"},
    "u7_rand_fold": {"o_orderkey": "bigint", "fold": "int"},
    "u9_group_split": {"event_id": "bigint", "user_id": "bigint", "split": "int"},
    "u_stratified_sample": {"doc_id": "bigint", "lang": "string"},
}


# Full-oracle queries EXPECTED to return 0 rows at sweep scale. Any
# OTHER full-oracle query returning 0 rows on BOTH sides is a VACUOUS
# pass — a 0-row Spark frame hash-matches a 0-row oracle no matter how
# wrong the query logic is (r10 shipped three of those; r11 fixed them
# by hand). The tripwire makes recurrence impossible: 0-row results
# FAIL unless whitelisted here with a reason.
EXPECTED_EMPTY: set[str] = set()


def compare_entry(
    name: str,
    spark_hash: tuple[int, list[str], str],
    oracle_hash: tuple[int, list[str], str],
    expected_empty: set[str] = EXPECTED_EMPTY,
) -> tuple[dict, str | None]:
    """Compare (rows, cols, value-hash) triples for one full-oracle
    query. Returns (report entry, failure reason or None). A 0-row
    match is a FAILURE unless the query is on the expected-empty
    whitelist (vacuous-oracle tripwire, r12)."""
    sn, sc, sh = spark_hash
    on_, oc, oh = oracle_hash
    entry = {
        "rows_match": sn == on_,
        "schema_match": sc == oc,
        "hash_match": sh == oh,
        "spark_rows": sn,
        "oracle_rows": on_,
        "err": None,
    }
    if sn != on_:
        return entry, f"rowcount spark={sn} oracle={on_}"
    if sc != oc:
        return entry, f"columns spark={sc} oracle={oc}"
    if sh != oh:
        return entry, f"value hash mismatch ({sn} rows)"
    if sn == 0 and name not in expected_empty:
        entry["vacuous"] = True
        return entry, (
            "vacuous oracle: spark AND oracle returned 0 rows "
            "(whitelist in EXPECTED_EMPTY if genuinely empty)"
        )
    return entry, None


def canon_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df) -> tuple[int, list[str], str]:
    """(row_count, sorted col names, order-insensitive value hash) of a pandas frame."""
    cols = sorted(df.columns)
    rows = [
        ",".join(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from azuredataengineering_deeplearning_spark import get_spark

    spark = get_spark(app_name="ades-check", shuffle_partitions=16)

    failed, passed, rows_only = [], 0, 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf_spark = fn(spark, sf_dir)
            spark_dtypes = dict(sdf_spark.dtypes)
            sdf = sdf_spark.toPandas()
        except Exception as e:
            failed.append((name, f"spark error: {str(e)[:400]}"))
            report[name] = {"err": f"spark error: {str(e)[:200]}"}
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            rows_only += 1
            contract = ROWS_ONLY_CONTRACTS.get(name)
            entry = {"rows_only": True, "spark_rows": len(sdf), "err": None}
            if contract is not None:
                schema_ok = spark_dtypes == contract
                entry["schema_contract_match"] = schema_ok
                entry["nonempty"] = len(sdf) > 0
                if not schema_ok:
                    failed.append(
                        (name, f"schema contract {spark_dtypes} != {contract}")
                    )
                    print(f"FAIL {name}: schema contract mismatch "
                          f"got={spark_dtypes} want={contract}")
                elif len(sdf) == 0:
                    failed.append((name, "rows-only query returned 0 rows"))
                    print(f"FAIL {name}: rows-only query returned 0 rows")
                else:
                    print(f"rows-only {name}: {len(sdf)} rows, schema ok "
                          f"({time.time()-t0:.1f}s)")
            else:
                print(f"rows-only {name}: {len(sdf)} rows (NO CONTRACT — "
                      f"add to ROWS_ONLY_CONTRACTS)  ({time.time()-t0:.1f}s)")
            report[name] = entry
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"duckdb error: {str(e)[:400]}"))
            report[name] = {"err": f"duckdb error: {str(e)[:200]}"}
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        entry, why = compare_entry(name, frame_hash(sdf), frame_hash(odf))
        report[name] = entry
        if why is not None:
            failed.append((name, why))
            print(f"FAIL {name}: {why}")
        else:
            passed += 1
            print(f"ok   {name}  ({entry['spark_rows']} rows, "
                  f"{time.time()-t0:.1f}s)")

    print(
        f"\n{passed} ok, {rows_only} rows-only, {len(failed)} failed"
        + (f": {[n for n, _ in failed]}" if failed else "")
    )
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
