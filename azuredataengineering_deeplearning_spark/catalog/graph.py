"""Catalog: recursive BOM closure vs DuckDB's recursive CTE.

Edges are derived deterministically from the part table (a binary tree
over the key space) — same construction on both sides; Spark's
iterative self-join loop must match DuckDB's WITH RECURSIVE exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.operators import graph as G
from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

_EDGES_SQL = """
      SELECT p_partkey AS parent, p_partkey * 2 + c AS child,
             (p_partkey % 3) + 1 AS qty
      FROM part, (SELECT unnest([1, 2]) AS c)
      WHERE p_partkey * 2 + c <= (SELECT max(p_partkey) FROM part)
"""


def _edges(spark, sf_dir):
    p = read_parquet(spark, f"{sf_dir}/part.parquet", columns=["p_partkey"])
    mx = p.agg(F.max("p_partkey")).collect()[0][0]
    return (
        p.select(
            F.col("p_partkey").alias("parent"),
            F.explode(
                F.array(
                    F.col("p_partkey") * 2 + 1, F.col("p_partkey") * 2 + 2
                )
            ).alias("child"),
            ((F.col("p_partkey") % 3) + 1).alias("qty"),
        )
        .filter(F.col("child") <= mx)
    )


@query(
    "graph_bom_closure",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    closure AS (
      SELECT parent AS root, child AS node, 1 AS level, CAST(qty AS DOUBLE) AS quantity
      FROM edges
      UNION ALL
      SELECT c.root, e.child, c.level + 1, c.quantity * e.qty
      FROM closure c JOIN edges e ON c.node = e.parent
    )
    SELECT root, node, level, quantity FROM closure
    """,
)
def graph_bom_closure(spark, sf_dir):
    """Transitive closure with path-multiplied quantities — the driver
    loop of distributed self-joins vs DuckDB WITH RECURSIVE."""
    return G.expand_hierarchy(
        _edges(spark, sf_dir), "parent", "child", quantity_col="qty", max_depth=30
    )


@query(
    "graph_bom_rollups",
    f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    closure AS (
      SELECT parent AS root, child AS node, 1 AS level FROM edges
      UNION ALL
      SELECT c.root, e.child, c.level + 1 FROM closure c JOIN edges e ON c.node = e.parent
    )
    SELECT root, COUNT(DISTINCT node) AS NumBOMParts, MAX(level) AS MaxBOMDepth,
           COUNT(*) AS NumBOMRows
    FROM closure GROUP BY root
    """,
)
def graph_bom_rollups(spark, sf_dir):
    """Per-root BOM roll-ups (``generate_data.py:392-396``)."""
    closure = G.expand_hierarchy(_edges(spark, sf_dir), "parent", "child", max_depth=30)
    return G.hierarchy_rollups(closure)
