"""Catalog: Python DataSource connector queries (S16/S17 distributed).

The `rest_windowed` source's offline stand-in feed is pure arithmetic
in (window_start, row_index), so DuckDB reproduces the *entire
connector output* from ``generate_series`` — the full read path
(partition planning → executor-side pagination → Arrow return) is
oracle-verified, not just smoke-tested.
"""

from __future__ import annotations

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.sources import pydatasource as PDS

_START, _END, _SLICE = 1_000_000, 1_021_600, 3_600  # 6 hourly windows

_FEED_SQL = f"""
    WITH w AS (SELECT unnest(generate_series({_START}, {_END} - 1, {_SLICE})) AS ws),
         i AS (SELECT unnest(generate_series(0, {PDS.ROWS_PER_WINDOW - 1})) AS i)
    SELECT CAST(ws + (i * {_SLICE}) // {PDS.ROWS_PER_WINDOW} AS BIGINT) AS event_ts,
           'e' || CAST(i % {PDS.N_ENTITIES} AS VARCHAR) AS entity,
           CAST((ws + i * 17) % 1000 AS DOUBLE) / 10.0 AS value,
           CAST(i // {PDS.PAGE_SIZE} AS INT) AS page
    FROM w CROSS JOIN i
"""


def _read(spark, start=_START, end=_END):
    PDS.register(spark)
    return (
        spark.read.format("rest_windowed")
        .option("start", str(start))
        .option("end", str(end))
        .option("slice", str(_SLICE))
        .load()
    )


@query("s16_rest_datasource", _FEED_SQL)
def s16_rest_datasource(spark, sf_dir):
    """Paginated REST ingestion as a Spark Python DataSource: one input
    partition per time-window slice, cursor pagination inside the
    partition (``devops_batch_download_all.py:79-170`` re-expressed so
    the cluster, not a driver thread pool, is the fan-out)."""
    return _read(spark)


@query(
    "s16_rest_pushdown",
    f"SELECT * FROM ({_FEED_SQL}) WHERE event_ts >= {_START + 4 * _SLICE}",
)
def s16_rest_pushdown(spark, sf_dir):
    """Filter pushdown through the Python DataSource: the event_ts bound
    reaches ``pushFilters`` and prunes non-overlapping window partitions
    before any fetch — the connector-level analog of parquet min/max
    skipping (``delta_table_rs.py:14-20`` shape)."""
    df = _read(spark)
    return df.filter(df.event_ts >= _START + 4 * _SLICE)
