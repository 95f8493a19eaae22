"""Catalog: the final TPC-H query shapes (Q2, Q9, Q11, Q12, Q15, Q20,
Q21), completing all 22 against the driver testdata star schema.

The testdata has no ``partsupp`` and no ``l_commitdate``/``l_shipmode``,
so the shapes that need them are adapted: supply cost is derived from
lineitem unit prices (MIN of ``l_extendedprice/l_quantity`` — an
order-independent double, bit-identical across engines), and "late
shipment" is ``l_shipdate > o_orderdate + 60 days``. What is preserved
is the query *structure* the optimizer has to handle — correlated-min
subqueries (Q2), scalar-subquery HAVING (Q11), subquery-equals-MAX
(Q15), aggregated-subquery semi-join (Q20), and the exists/not-exists
double-correlation (Q21) — which is what the reference's ad-hoc Gold
reporting exercises (SURVEY §3.1 step 5,
``databricks_synapse_sql_writer.py:87-99``).

Exactness conventions per catalog/__init__: decimal accumulation for
sums, MIN/MAX of raw doubles or timestamps (order-independent), and
double casts only at output — so the DuckDB hash-compare is stable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.functions.exact import dec
from azuredataengineering_deeplearning_spark.sources.readers import load_tables


def _revenue():
    one = F.lit(1).cast("decimal(18,6)")
    return dec("l_extendedprice") * (one - dec("l_discount"))


_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))"
)


@query(
    "q2_min_cost_supplier",
    """
    WITH euro_supp AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE'
    ), cost AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM euro_supp)
        GROUP BY 1, 2
    ), best AS (
        SELECT pk, MIN(unit_cost) AS best_cost FROM cost GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
    FROM cost
    JOIN best USING (pk)
    JOIN part ON p_partkey = pk
    JOIN euro_supp ON s_suppkey = sk
    WHERE unit_cost = best_cost
      AND p_size IN (5, 10, 15, 20)
      AND p_type = 'LARGE'
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: cheapest supplier per part — the correlated MIN
    subquery decorrelated into a per-part min aggregate joined back.
    Supply cost = MIN(l_extendedprice/l_quantity) per (part, supplier):
    MIN over IEEE doubles is order-independent, so the min-equality
    filter is exact on both engines. supplier/nation/region and the
    filtered part dim broadcast; the per-part best rides a window over
    the (pk, sk) aggregate so lineitem is scanned exactly once."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"]
    )
    euro = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        t["lineitem"]
        .join(
            F.broadcast(euro.select("s_suppkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # per-part best as an unordered window over the (pk, sk) aggregate:
    # one lineitem scan and the pk shuffle is shared, instead of a second
    # scan + groupBy + join-back branch
    best = F.min("unit_cost").over(Window.partitionBy("pk"))
    part = t["part"].filter(
        F.col("p_size").isin(5, 10, 15, 20) & (F.col("p_type") == "LARGE")
    )
    return (
        cost.withColumn("best_cost", best)
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("pk"))
        .join(F.broadcast(euro), F.col("s_suppkey") == F.col("sk"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
    )


@query(
    "q9_product_type_profit",
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM({_SQL_REV}) AS DOUBLE)
           - 0.1 * CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))
                            * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    part-name pattern. Supply cost proxied as 10% of retail value
    (testdata has no partsupp). Revenue and cost accumulate as separate
    exact decimal sums; the 0.1 factor applies once per group in double
    at output — no per-row double rounding to drift."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "part", "supplier", "orders", "nation"]
    )
    part = t["part"].filter(F.col("p_name").like("%widget%"))
    joined = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(_revenue()).cast("double").alias("rev"),
            F.sum(dec("p_retailprice") * dec("l_quantity"))
            .cast("double")
            .alias("cost"),
        )
        .select(
            "nation",
            "o_year",
            (F.col("rev") - F.lit(0.1) * F.col("cost")).alias("sum_profit"),
        )
    )


@query(
    "q11_important_stock",
    """
    WITH value_by_part AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY 1
    )
    SELECT pk AS l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE CAST(part_value AS DOUBLE) >
          0.001 * (SELECT CAST(SUM(part_value) AS DOUBLE) FROM value_by_part)
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part value share vs a global-total scalar
    subquery (HAVING > fraction * SUM() OVER all). The global total is
    a 1-row aggregate crossJoin-broadcast onto the per-part rows — no
    driver collect. Both sides accumulate exact decimals and compare in
    double with the identical expression, so threshold rows agree."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    nat = t["nation"].filter(F.col("n_name") == "NATION_7")
    supp = t["supplier"].join(
        F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey")
    )
    value = (
        t["lineitem"]
        .join(
            F.broadcast(supp.select("s_suppkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(dec("l_extendedprice")).alias("part_value_dec"))
        # probe + broadcast-threshold branch both consume this agg;
        # AQE won't reuse the exchange under the broadcast branch —
        # pin the O(#parts) frame so lineitem aggregates ONCE
        .localCheckpoint(eager=True)
    )
    total = value.agg(
        (F.lit(0.001) * F.sum("part_value_dec").cast("double")).alias("threshold")
    )
    return (
        value.crossJoin(F.broadcast(total))
        .select(
            F.col("pk").alias("l_partkey"),
            F.col("part_value_dec").cast("double").alias("part_value"),
            "threshold",
        )
        .filter(F.col("part_value") > F.col("threshold"))
        .drop("threshold")
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape: late-shipment priority counts — a cross-table
    predicate (shipdate vs orderdate + slack; the testdata has no
    commit/receipt dates) that must evaluate post-join, plus the
    single-pass high/low conditional-count pair. The shipdate range
    still pushes to the lineitem scan."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, SUM({_SQL_REV}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the revenue "view" + WHERE total = (SELECT MAX)
    — per-supplier quarterly revenue as an exact decimal sum, the max a
    1-row broadcast, the equality filter exact because both sides are
    the same decimal. Ties all survive (order-insensitive result)."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_rev_dec"))
        # both the probe and the broadcast MAX branch consume this
        # aggregate, and this Spark build's AQE does not reuse
        # exchanges under broadcast branches — pin the small
        # O(#suppliers) frame so the lineitem scan+agg runs ONCE
        .localCheckpoint(eager=True)
    )
    top = revenue.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev_dec") == F.col("max_rev"))
        .join(
            F.broadcast(t["supplier"]),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
    )


@query(
    "q20_part_promotion_suppliers",
    """
    WITH shipped AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ), tot AS (
        SELECT pk, SUM(qty) AS tot_qty FROM shipped GROUP BY 1
    ), qualifying AS (
        SELECT DISTINCT sk
        FROM shipped
        JOIN tot USING (pk)
        JOIN part ON p_partkey = pk
        WHERE p_name LIKE '%bolt%'
          AND CAST(qty AS DOUBLE) > 0.3 * CAST(tot_qty AS DOUBLE)
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT sk FROM qualifying)
    """,
)
def q20_part_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers holding a dominant share of a part
    family — the aggregated correlated subquery (availqty > 0.5 * sum
    shipped, here >30% of the part's 1997 shipped total) becomes one
    grouped agg plus an unordered window on the same l_partkey shuffle,
    then DISTINCT supplier keys drive a left-semi join against the
    supplier dim."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier", "nation"])
    bolt = t["part"].filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    # semi-filter to the part family BEFORE aggregating — the per-part
    # total is unchanged (window partitions by pk) and the shuffle only
    # carries qualifying parts
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(bolt), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    # per-part total as an unordered window over the (pk, sk) aggregate:
    # one scan, the pk shuffle shared, no second groupBy + join-back
    tot_qty = F.sum("qty").over(Window.partitionBy("pk"))
    qualifying = (
        shipped.withColumn("tot_qty", tot_qty)
        .filter(
            F.col("qty").cast("double")
            > F.lit(0.3) * F.col("tot_qty").cast("double")
        )
        .select("sk")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(qualifying), F.col("sk") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q21_waiting_suppliers",
    """
    WITH per AS (
        SELECT l_orderkey AS ok, l_suppkey AS sk, MAX(l_shipdate) AS s_max
        FROM lineitem GROUP BY 1, 2
    ), agg AS (
        SELECT ok, MAX(s_max) AS o_max, COUNT(*) AS n_supp FROM per GROUP BY 1
    ), latest AS (
        SELECT per.ok, per.sk
        FROM per JOIN agg USING (ok)
        WHERE per.s_max = agg.o_max AND agg.n_supp > 1
    ), uniq AS (
        SELECT ok FROM latest GROUP BY ok HAVING COUNT(*) = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM latest
    JOIN uniq USING (ok)
    JOIN supplier ON s_suppkey = sk
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: the EXISTS (another supplier on the order) +
    NOT EXISTS (anyone shipping later) double correlation, expressed as
    per-(order, supplier) MAX shipdate → per-order MAX + supplier count
    → keep sole latest shippers on multi-supplier orders. Timestamp
    MAX is exact, so the equality filter is deterministic. All
    per-order stats ride one window over the l_orderkey shuffle;
    supplier dim broadcasts."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    per = (
        t["lineitem"]
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    # per-order max / supplier count / latest-shipper count all ride ONE
    # unordered window over the (ok, sk) aggregate — a single lineitem
    # scan and a single ok shuffle instead of three agg+join branches
    w = Window.partitionBy("ok")
    enriched = (
        per.withColumn("o_max", F.max("s_max").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_latest",
            F.sum(
                F.when(F.col("s_max") == F.col("o_max"), 1).otherwise(0)
            ).over(w),
        )
    )
    return (
        enriched.filter(
            (F.col("s_max") == F.col("o_max"))
            & (F.col("n_supp") > 1)
            & (F.col("n_latest") == 1)
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("sk"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
