"""Order-independent numeric aggregation for oracle-exact results.

Floating-point sums are order-dependent: Spark's partial aggregation adds
doubles in partition order, DuckDB in its own order, and at ~1e8
magnitudes the results differ in the 6th decimal the correctness harness
hashes. The fix is exact decimal arithmetic: cast operands to
DECIMAL(18,6) (exact, order-independent sums), aggregate, cast the final
scalar back to DOUBLE. Both engines then produce bit-identical doubles.

``sql_*`` emit the matching DuckDB SQL fragment so Spark-side and
oracle-side stay in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    """Cast to the engine's exact-arithmetic decimal type."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def exact_sum(col: Column | str, alias: str) -> Column:
    """SUM with order-independent decimal accumulation, result DOUBLE."""
    return F.sum(dec(col)).cast("double").alias(alias)


def exact_avg(col: Column | str, alias: str) -> Column:
    """AVG as exact-sum / count — identical IEEE division in both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def sql_sum(expr: str, alias: str) -> str:
    """DuckDB fragment matching :func:`exact_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_avg(expr: str, alias: str) -> str:
    """DuckDB fragment matching :func:`exact_avg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
