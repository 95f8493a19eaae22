"""Recursive hierarchy (BOM) expansion (J10/D6; reference
``DataEngineering/Python/parent_child_recursion.py:5-65`` and the
quantity-aware copy ``MachineLearning/Ray/recsys/generate_data.py:273-342``).

Spark has no recursive CTE, so the closure is a bounded driver loop of
self-joins — the one legitimately iterative operator in the engine. Each
level is a *distributed* join (frontier ⋈ edges on the same key
partitioning); the driver only decides when to stop. Lineage is
truncated with ``localCheckpoint`` every few levels so 100-level deep
hierarchies don't accumulate a 100-join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_hierarchy(
    edges: DataFrame,
    parent_col: str = "parent",
    child_col: str = "child",
    quantity_col: str | None = None,
    max_depth: int = 20,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Transitive closure with level numbers → (root, node, level[,
    quantity]).

    Level 1 = direct children of every node (matching the reference: the
    closure is computed from *every* node as a root, so sub-assembly
    roll-ups come free). ``quantity_col`` multiplies along the path —
    the multiplicity semantics of ``generate_data.py:298-307`` (a child
    under two parents contributes once per path). Stops at the first
    empty frontier or ``max_depth``."""
    base = edges.select(
        F.col(parent_col).alias("root"),
        F.col(child_col).alias("node"),
        F.lit(1).alias("level"),
        *(
            [F.col(quantity_col).cast("double").alias("quantity")]
            if quantity_col
            else []
        ),
    )
    # pinned for the loop's lifetime: every level joins the same edge
    # projection, and without the pin each level re-scans the source
    # (this build's AQE does not reuse exchanges across actions). BOM
    # edge lists are dimension-scale — parent/child pairs, not facts —
    # so the pin is bounded; MEMORY_AND_DISK spills if it isn't.
    e = edges.select(
        F.col(parent_col).alias("__p"),
        F.col(child_col).alias("__c"),
        *(
            [F.col(quantity_col).cast("double").alias("__q")]
            if quantity_col
            else []
        ),
    ).persist()
    result = base
    frontier = base
    for depth in range(2, max_depth + 1):
        # alias both sides: each iteration is a self-join on lineage that
        # shares the original edges scan
        stepped = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.node") == F.col("e.__p"), "inner")
            .select(
                F.col("f.root").alias("root"),
                F.col("e.__c").alias("node"),
                F.lit(depth).alias("level"),
                *(
                    [(F.col("f.quantity") * F.col("e.__q")).alias("quantity")]
                    if quantity_col
                    else []
                ),
            )
        )
        if checkpoint_every and depth % checkpoint_every == 0:
            stepped = stepped.localCheckpoint(eager=True)
        if stepped.isEmpty():
            break
        frontier = stepped
        result = result.unionByName(stepped)
    return result


def hierarchy_rollups(closure: DataFrame) -> DataFrame:
    """Per-root roll-ups (``generate_data.py:392-396``): distinct part
    count, max depth, total closure rows."""
    return closure.groupBy("root").agg(
        F.countDistinct("node").alias("NumBOMParts"),
        F.max("level").alias("MaxBOMDepth"),
        F.count(F.lit(1)).alias("NumBOMRows"),
    )
