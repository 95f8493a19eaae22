"""DDL generation: medallion tier tables + warehouse export planning.

Covers the reference's two generators:

- ``AIO_delta_table_generator.py:48-180`` (S22): per-tier CREATE TABLE
  statements from an inferred schema — Bronze adds ``sourceFile``
  lineage, Silver adds the SCD2 housekeeping set + identity surrogate,
  TBLPROPERTIES enable column mapping + change data feed.
- ``databricks_synapse_sql_writer.py:167-248``: profiling-driven
  warehouse DDL — varchar(n) sized from observed ``max(length)+5``,
  varchar(max) at ≥8000, truncation at ≥400000; clustered columnstore
  for ≥60M-row tables (unless varchar(max) present), else
  REPLICATE + HEAP.

Both emit SQL *text* (the one legitimate SQL-string surface in the
engine — DDL has no DataFrame form); execution is the caller's choice
(``spark.sql`` with Delta, a warehouse cursor for the export DDL).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.functions.strings import quote_if_needed

TIERS = ("Bronze", "Silver", "Gold")

VARCHAR_MAX_THRESHOLD = 8_000
TRUNCATE_THRESHOLD = 400_000
COLUMNSTORE_MIN_ROWS = 60_000_000


def tier_ddl(
    table: str,
    schema: Mapping[str, str],
    tier: str,
    database_prefix: str = "d",
    natural_key: str = "ID",
    location: str | None = None,
) -> str:
    """One tier's CREATE TABLE (S22 semantics).

    Bronze: raw schema + ``sourceFile string``. Silver: + identity
    surrogate ``{table}Key`` and SCD2 housekeeping (tinyint/int types
    per ``AIO_delta_table_generator.py:79-93``). Gold: curated copy of
    the silver shape without lineage."""
    cols = [f"  {quote_if_needed(c)} {t}" for c, t in schema.items()]
    if tier == "Bronze":
        cols.append("  sourceFile string")
    elif tier == "Silver":
        cols = [
            f"  {table}Key bigint GENERATED ALWAYS AS IDENTITY",
            *cols,
            "  sourceFile string",
            "  currentVersion tinyint",
            "  effectiveDate int",
            "  expirationDate int",
        ]
    body = ",\n".join(cols)
    loc = f"\nLOCATION '{location}'" if location else ""
    return (
        f"CREATE OR REPLACE TABLE {database_prefix}{tier.lower()}.{table} (\n"
        f"{body}\n)\nUSING DELTA{loc}\n"
        "TBLPROPERTIES (\n"
        "  'delta.columnMapping.mode' = 'name',\n"
        "  'delta.enableChangeDataFeed' = 'true',\n"
        "  'delta.minReaderVersion' = '2',\n"
        "  'delta.minWriterVersion' = '5'\n)"
    )


def medallion_ddl(
    table: str, schema: Mapping[str, str], **kwargs
) -> dict[str, str]:
    """All three tiers (the generator's ``for tier in [...]`` loop)."""
    return {tier: tier_ddl(table, schema, tier, **kwargs) for tier in TIERS}


def deep_clone_ddl(table: str, src_db: str, dst_db: str) -> str:
    """S21: environment promotion via DEEP CLONE
    (``AIO_delta_table_generator.py:134-140``)."""
    return (
        f"CREATE OR REPLACE TABLE {dst_db}.{table}\n"
        f"DEEP CLONE {src_db}.{table}"
    )


def plan_varchar_ddl(df: DataFrame, headroom: int = 5) -> dict[str, str]:
    """Export-type planning from one length-profiling aggregate
    (``databricks_synapse_sql_writer.py:170-182``): observed
    max(length)+headroom → ``varchar(n)``; ≥8000 → ``varchar(max)``;
    ≥400000 → ``varchar(max)`` + truncation required (see
    :func:`truncate_for_export`). Non-strings map per the reference's
    type table (double→float, boolean→bit, timestamp→datetime2(7))."""
    type_map = {
        "double": "float",
        "boolean": "bit",
        "timestamp": "datetime2(7)",
        "int": "int",
        "bigint": "bigint",
        "smallint": "smallint",
        "tinyint": "tinyint",
        "date": "date",
    }
    strings = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    plan: dict[str, str] = {}
    if strings:
        row = df.agg(
            *[(F.max(F.length(c)) + headroom).alias(c) for c in strings]
        ).collect()[0]
        for c in strings:
            n = row[c] or headroom
            plan[c] = "varchar(max)" if n >= VARCHAR_MAX_THRESHOLD else f"varchar({n})"
    for f in df.schema.fields:
        if f.name not in plan:
            plan[f.name] = type_map.get(f.dataType.simpleString(), "varchar(max)")
    return plan


def export_table_ddl(
    table: str, plan: Mapping[str, str], n_rows: int
) -> str:
    """Distribution/index selection
    (``databricks_synapse_sql_writer.py:190-248``): big tables (≥60M
    rows, no varchar(max)) → HASH-distributed clustered columnstore;
    otherwise REPLICATE + HEAP."""
    cols = ",\n".join(f"  {quote_if_needed(c)} {t}" for c, t in plan.items())
    big = n_rows >= COLUMNSTORE_MIN_ROWS and "varchar(max)" not in plan.values()
    first = next(iter(plan))
    phys = (
        f"DISTRIBUTION = HASH({quote_if_needed(first)}),\n  CLUSTERED COLUMNSTORE INDEX"
        if big
        else "DISTRIBUTION = REPLICATE,\n  HEAP"
    )
    return f"CREATE TABLE {table} (\n{cols}\n)\nWITH (\n  {phys}\n)"


def truncate_for_export(df: DataFrame, plan: Mapping[str, str]) -> DataFrame:
    """Apply the ≥400000-char truncation the reference does before bulk
    copy (``databricks_synapse_sql_writer.py:318-321``)."""
    out = {}
    for c, t in plan.items():
        if t == "varchar(max)":
            out[c] = F.when(
                F.length(F.col(c)) > TRUNCATE_THRESHOLD,
                F.substring(F.col(c), 1, TRUNCATE_THRESHOLD),
            ).otherwise(F.col(c))
    return df.withColumns(out) if out else df


def date_view_ddl(
    view: str,
    table: str,
    columns: Sequence[str],
    date_key_columns: Sequence[str],
    dim_table: str = "dim.Date",
    date_key: str = "dateKey",
) -> str:
    """Generated star-view SQL: one LEFT JOIN of the calendar dimension
    per dateKey column, guarded by ``CASE WHEN {col} > 0`` so sentinel
    keys (0 = not-yet-occurred, -9999 = missing) never match
    (``databricks_synapse_sql_writer.py:87-99`` view generator; the
    runtime DataFrame analog is ``joins.date_dim_lookup``)."""
    selects = [f"  t.{quote_if_needed(c)}" for c in columns]
    joins = []
    for i, c in enumerate(date_key_columns):
        alias = f"d{i}"
        selects.append(f"  {alias}.* ")
        joins.append(
            f"LEFT JOIN {dim_table} {alias}\n"
            f"  ON CASE WHEN t.{quote_if_needed(c)} > 0"
            f" THEN t.{quote_if_needed(c)} END = {alias}.{date_key}"
        )
    body = ",\n".join(s.rstrip() for s in selects)
    join_sql = "\n".join(joins)
    return f"CREATE VIEW {view} AS\nSELECT\n{body}\nFROM {table} t\n{join_sql}"
