"""Catalog-wide output contract: every query must emit only
driver-canonicalizable scalar columns (the driver's hash harness sorts
pandas frames and crashes on list/map/struct cells — the round-2 d2
failure class). Arrays must be CSV-joined before they leave a query."""

from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as E

import pytest

pytestmark = pytest.mark.slow  # heavy differential/fuzz suite: deselected by default (pytest.ini), run with -m ""


SF_DIR = "/root/testdata/sf0.001"


def test_every_query_builds_and_emits_scalars_only(spark):
    bad = {}
    spark.catalog.clearCache()
    for name, fn in E.queries().items():
        try:
            schema = fn(spark, SF_DIR).schema
        except Exception as exc:
            bad[name] = f"build failed: {type(exc).__name__}: {exc}"[:160]
            continue
        nonscalar = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nonscalar:
            bad[name] = f"non-scalar columns {nonscalar}"
    # building some queries persists internal frames (e.g. contingency
    # caches); drop them so later tests see pristine plans
    spark.catalog.clearCache()
    assert not bad, bad


def test_duplicate_query_name_raises():
    """The registry guard (round 13): a second registration of an
    existing name from a DIFFERENT function is a loud error, not a
    silent shadow."""
    import pytest

    from azuredataengineering_deeplearning_spark.catalog import query

    @query("_dup_guard_probe")
    def probe_a(spark, sf_dir):  # pragma: no cover - never run
        return None

    # same function re-registering (module re-import) is fine
    query("_dup_guard_probe")(probe_a)

    with pytest.raises(ValueError, match="duplicate catalog query"):
        @query("_dup_guard_probe")
        def probe_b(spark, sf_dir):  # pragma: no cover - never run
            return None

    from azuredataengineering_deeplearning_spark.catalog import QUERIES

    del QUERIES["_dup_guard_probe"]
