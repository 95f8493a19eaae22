"""Catalog: KQL-subset translation over lake tables (S8/S9 surface)."""

from __future__ import annotations

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df
from azuredataengineering_deeplearning_spark.sources.readers import load_tables


@query(
    "kql_where_project_top",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase' AND value > 50
    ORDER BY value DESC, event_id ASC LIMIT 20
    """,
)
def kql_where_project_top(spark, sf_dir):
    """KQL pipe: where → project → sort → take (``spark_read_kusto.py``
    pushdown shape, executed locally by the translator)."""
    t = load_tables(spark, sf_dir, ["events"])
    return kql_to_df(
        t,
        """
        events
        | where event_type == 'purchase' and value > 50
        | project event_id, user_id, value
        | sort by value desc, event_id asc
        | take 20
        """,
    )


@query(
    "kql_summarize",
    """
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
           MAX(value) AS peak
    FROM events GROUP BY event_type
    """,
)
def kql_summarize(spark, sf_dir):
    """KQL summarize with count/dcount/max by key."""
    t = load_tables(spark, sf_dir, ["events"])
    return kql_to_df(
        t,
        "events | summarize n=count(), users=dcount(user_id), peak=max(value) by event_type",
    )


@query(
    "kql_arg_max",
    """
    SELECT event_id, user_id FROM (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def kql_arg_max(spark, sf_dir):
    """KQL ``summarize arg_max(Rev, *) by key`` — the daily_eval latest-
    revision pattern (``daily_eval.py:158``)."""
    t = load_tables(spark, sf_dir, ["events"])
    out = kql_to_df(t, "events | summarize arg_max(event_id, *) by user_id")
    return out.select("event_id", "user_id")
