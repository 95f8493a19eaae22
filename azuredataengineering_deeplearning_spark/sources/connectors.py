"""Connector adapters (SURVEY §2.1 S6-S17): the external-system surface.

The reference talks to Azure services directly (Synapse JDBC/ODBC,
Kusto, ADLS/Blob SDKs, DevOps REST, Azure Monitor). This engine keeps
those behaviors behind small adapter interfaces so the pipeline code is
identical on a laptop and a cluster; network SDKs are not available (or
wanted) in this environment, so each adapter ships with a local
stand-in used by the tests. Public API shapes only — no proprietary
endpoints or credentials appear anywhere.
"""

from __future__ import annotations

import abc
from collections.abc import Callable, Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


class TableSource(abc.ABC):
    """A named external table that materializes as a DataFrame."""

    @abc.abstractmethod
    def read(self, spark: SparkSession, query: str | None = None) -> DataFrame: ...


class JdbcSource(TableSource):
    """S6/S7: generic JDBC read (Synapse sqldw shape,
    ``spark_read_sql.py:14-21``). Pushdown: pass ``query`` to run
    server-side; partition options parallelize the read."""

    def __init__(
        self,
        url: str,
        table: str,
        properties: Mapping[str, str] | None = None,
        partition_column: str | None = None,
        num_partitions: int = 8,
        bounds: tuple[int, int] | None = None,
    ):
        self.url, self.table = url, table
        self.properties = dict(properties or {})
        self.partition_column = partition_column
        self.num_partitions = num_partitions
        self.bounds = bounds

    def read(self, spark: SparkSession, query: str | None = None) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"({query}) q" if query else self.table)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column and self.bounds:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.bounds[0]))
                .option("upperBound", str(self.bounds[1]))
                .option("numPartitions", str(self.num_partitions))
            )
        return reader.load()


class KustoSource(TableSource):
    """S8/S9: KQL query source. On a cluster this binds to the Kusto
    Spark connector; the local stand-in routes a *translated* query to a
    DataFrame-producing callable so pipelines can be tested offline
    (``spark_read_kusto.py:21-34`` shape)."""

    def __init__(self, cluster: str, database: str, executor: Callable[[str], DataFrame] | None = None):
        self.cluster, self.database = cluster, database
        self._executor = executor

    def read(self, spark: SparkSession, query: str | None = None) -> DataFrame:
        if self._executor is None:
            raise NotImplementedError(
                "Kusto connector requires the kusto-spark connector on a "
                "cluster; pass executor= for a local stand-in"
            )
        return self._executor(query or "")


class RestPaginatedSource(TableSource):
    """S16: paginated REST ingestion (``devops_batch_download_all.py:79-170``
    shape: page loop → rows → DataFrame). ``fetch_page(cursor) ->
    (rows, next_cursor | None)``; the loop is driver-side (control
    plane), rows land distributed via ``createDataFrame`` per page and a
    union — at scale, land pages to object storage and bulk-read
    instead."""

    def __init__(
        self,
        fetch_page: Callable[[str | None], tuple[Sequence[tuple], str | None]],
        schema: str,
        max_pages: int = 10_000,
    ):
        self.fetch_page = fetch_page
        self.schema = schema
        self.max_pages = max_pages

    def read(self, spark: SparkSession, query: str | None = None) -> DataFrame:
        from functools import reduce

        cursor, frames, pages = None, [], 0
        while pages < self.max_pages:
            rows, cursor = self.fetch_page(cursor)
            if rows:
                frames.append(spark.createDataFrame(list(rows), self.schema))
            pages += 1
            if cursor is None:
                break
        if not frames:
            return spark.createDataFrame([], self.schema)
        return reduce(DataFrame.unionByName, frames)


class ParquetStandIn(TableSource):
    """Local stand-in for any remote table: a parquet path. Used by the
    tests to run connector-shaped pipelines offline."""

    def __init__(self, path: str):
        self.path = path

    def read(self, spark: SparkSession, query: str | None = None) -> DataFrame:
        df = spark.read.parquet(self.path)
        if query:
            df.createOrReplaceTempView("__standin")
            return spark.sql(query.replace("{table}", "__standin"))
        return df


def list_files(
    spark: SparkSession,
    glob: str,
    suffix: str | None = None,
    modified_after=None,
) -> DataFrame:
    """S12: recursive file listing with mtime/extension filters
    (``datalake_find_files.py:25-44``) — via the binaryFile source's
    metadata-only scan (content column pruned away)."""
    from pyspark.sql import functions as F

    df = spark.read.format("binaryFile").load(glob).select(
        "path", "modificationTime", "length"
    )
    if suffix:
        df = df.filter(F.col("path").endswith(suffix))
    if modified_after is not None:
        df = df.filter(F.col("modificationTime") > modified_after)
    return df


class JdbcStagedSink:
    """Write-side S6/S7: the staged-swap bulk-load workflow of the
    reference's warehouse writer (``databricks_synapse_sql_writer.py``:
    identify → create staging table → bulk write → swap into place →
    drop old), expressed as a statement plan plus one Spark JDBC write.

    The swap makes the load ATOMIC for readers: they see the old table
    until the single sp_rename/RENAME transaction, never a half-loaded
    one — the warehouse-side analog of the engine's parquet
    staged-rename discipline. DDL strings come from
    ``ddl.export_table_ddl`` (varchar plan); statements execute through
    an injected ``executor`` callable so the workflow is fully testable
    offline (same stand-in posture as :class:`KustoSource`), and the
    bulk write itself is Spark's parallel JDBC writer when a live
    ``url`` is configured."""

    def __init__(self, url: str | None, table: str, executor=None):
        self.url, self.table = url, table
        self.executor = executor
        self.statements: list[str] = []

    def _exec(self, sql: str) -> None:
        self.statements.append(sql)
        if self.executor is not None:
            self.executor(sql)

    def write(
        self,
        df: DataFrame,
        varchar_plan: Mapping[str, str],
        n_rows: int | None = None,
    ) -> list[str]:
        from azuredataengineering_deeplearning_spark.sources.ddl import (
            export_table_ddl,
            truncate_for_export,
        )

        df = truncate_for_export(df, varchar_plan)
        if n_rows is None:
            n_rows = df.count()
        staging = f"{self.table}__staging"
        old = f"{self.table}__old"
        self._exec(f"IF OBJECT_ID('{staging}') IS NOT NULL DROP TABLE [{staging}]")
        self._exec(export_table_ddl(staging, varchar_plan, n_rows))
        if self.url is not None:
            (
                df.write.format("jdbc")
                .option("url", self.url)
                .option("dbtable", staging)
                .mode("append")
                .save()
            )
        self._exec(f"IF OBJECT_ID('{old}') IS NOT NULL DROP TABLE [{old}]")
        self._exec(
            f"IF OBJECT_ID('{self.table}') IS NOT NULL "
            f"EXEC sp_rename '{self.table}', '{old}'"
        )
        self._exec(f"EXEC sp_rename '{staging}', '{self.table}'")
        self._exec(f"IF OBJECT_ID('{old}') IS NOT NULL DROP TABLE [{old}]")
        return list(self.statements)
