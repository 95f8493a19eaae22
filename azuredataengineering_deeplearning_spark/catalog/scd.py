"""Catalog: changeset-merge engine (J5/J6) as an end-to-end query.

Target = latest pre-1998 order per customer (initial load); changeset =
latest 1998+ order per customer. One ``apply_changeset`` batch must
expire changed customers' rows, insert replacements and new keys, and
pass unchanged rows through — compared against a DuckDB reconstruction
of the same SCD2 semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.operators import merge as M
from azuredataengineering_deeplearning_spark.operators.aggregates import argmax_rows
from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

_CUT = "1998-01-01"

_MERGE_SQL = f"""
    WITH tgt AS (
      SELECT o_custkey, o_totalprice,
             CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS effectiveDate
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate < TIMESTAMP '{_CUT}') WHERE rn = 1
    ), cs AS (
      SELECT o_custkey, o_totalprice,
             CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS eff,
             CAST(strftime(CAST(strptime(CAST(CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS VARCHAR),
                  '%Y%m%d') AS DATE) - INTERVAL 1 DAY, '%Y%m%d') AS INT) AS eff_minus_1
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate >= TIMESTAMP '{_CUT}') WHERE rn = 1
    ), t_out AS (
      SELECT t.o_custkey, t.o_totalprice, t.effectiveDate,
             CASE WHEN cs.o_custkey IS NOT NULL
                       AND cs.o_totalprice IS DISTINCT FROM t.o_totalprice
                  THEN cs.eff_minus_1 ELSE 20991231 END AS expirationDate,
             CASE WHEN cs.o_custkey IS NOT NULL
                       AND cs.o_totalprice IS DISTINCT FROM t.o_totalprice
                  THEN 0 ELSE 1 END AS currentVersion
      FROM tgt t LEFT JOIN cs ON t.o_custkey = cs.o_custkey
    ), ins AS (
      SELECT cs.o_custkey, cs.o_totalprice, cs.eff AS effectiveDate,
             20991231 AS expirationDate, 1 AS currentVersion
      FROM cs LEFT JOIN tgt t ON cs.o_custkey = t.o_custkey
      WHERE t.o_custkey IS NULL OR cs.o_totalprice IS DISTINCT FROM t.o_totalprice
    )
    SELECT * FROM t_out UNION ALL SELECT * FROM ins
"""


@query("scd2_merge_changeset", _MERGE_SQL)
def scd2_merge_changeset(spark, sf_dir):
    """One SCD2 merge batch over the customer dimension derived from
    orders (latest-pre-cut state + latest-post-cut changeset)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    pre = argmax_rows(
        o.filter(F.col("o_orderdate") < _CUT),
        ["o_custkey"], "o_orderdate", tiebreak=["o_orderkey"],
    ).select("o_custkey", "o_totalprice", "o_orderdate")
    post = argmax_rows(
        o.filter(F.col("o_orderdate") >= _CUT),
        ["o_custkey"], "o_orderdate", tiebreak=["o_orderkey"],
    ).select("o_custkey", "o_totalprice", "o_orderdate")

    target = M.initial_load(pre, ["o_custkey"], "o_orderdate")
    merged = M.apply_changeset(
        target, post, ["o_custkey"], "o_orderdate", compare_cols=["o_totalprice"]
    )
    return merged.select(
        "o_custkey",
        "o_totalprice",
        "effectiveDate",
        "expirationDate",
        F.col("currentVersion").cast("int").alias("currentVersion"),
    )
