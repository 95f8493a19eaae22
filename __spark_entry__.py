"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(``azuredataengineering_deeplearning_spark/catalog/``): every implemented
operator from SURVEY.md §2 registers a named query built from engine
operators plus, where SQL-expressible, a DuckDB oracle. The driver runs
``entry`` as a smoke check and hash-compares each ``queries()`` entry
against ``oracle_sql()`` at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azuredataengineering_deeplearning_spark import catalog as _catalog

_catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-table star join, exact-decimal revenue) at sf0.001."""
    return _catalog.QUERIES["q5_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_catalog.ORACLES)
