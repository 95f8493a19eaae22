"""Catalog: end-to-end composite pipelines (SURVEY §3.3 parity).

These chain many operators into the shapes the reference actually runs:
the recsys sessionization pipeline (``generate_data.py`` steps 2-4) and
an LLM-corpus preparation pipeline (clean → profile → lang-ID → quality
→ dedup). Each is still one lazy Spark plan — Catalyst fuses the whole
chain; the oracle reconstructs it in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.functions.strings import collapse_whitespace
from azuredataengineering_deeplearning_spark.operators import dedup as DD
from azuredataengineering_deeplearning_spark.operators import text as T
from azuredataengineering_deeplearning_spark.operators import windows as W
from azuredataengineering_deeplearning_spark.operators.aggregates import argmax_rows
from azuredataengineering_deeplearning_spark.sources.readers import load_tables, read_parquet


@query(
    "pipeline_sessions",
    """
    WITH g AS (
      SELECT user_id, event_id, value, epoch_ns(ts) AS tns,
             CAST(json_extract_string(props, '$.k') AS INT) AS k,
             CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_ns(ts)) > 3600000000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT) AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           list(k ORDER BY k, event_id) AS ks
    FROM s GROUP BY user_id, session_id
    """,
)
def pipeline_sessions(spark, sf_dir):
    """Recsys pipeline steps 2-3 (``generate_data.py:120-175``):
    sessionize by 1 h gap → per-session JSON payload combine (ordered
    array, the groupwise array-concat) + exact session totals."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sess = W.sessionize(ev, ["user_id"], "ts_ns", gap=3_600_000_000_000)
    parsed = sess.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return parsed.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "event_id"))),
            lambda s: s["k"],
        ).alias("ks"),
    )


@query(
    "pipeline_latest_session_per_user",
    """
    WITH g AS (
      SELECT user_id, epoch_ns(ts) AS tns,
             CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_ns(ts)) > 3600000000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), s AS (
      SELECT user_id, tns, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT) AS session_id
      FROM g
    ), agg AS (
      SELECT user_id, session_id, COUNT(*) AS n_events, MAX(tns) AS last_tns
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, n_events FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY last_tns DESC, session_id DESC) AS rn FROM agg
    ) WHERE rn = 1
    """,
)
def pipeline_latest_session_per_user(spark, sf_dir):
    """Recsys step 3b: latest-wins dedup — one current session per user
    (``generate_data.py:174`` keep='last' as the A9 window pattern)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sess = W.sessionize(ev, ["user_id"], "ts_ns", gap=3_600_000_000_000)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts_ns").alias("last_tns")
    )
    latest = argmax_rows(
        per_session, ["user_id"], "last_tns", tiebreak=["session_id"]
    )
    return latest.select("user_id", "session_id", "n_events")


@query(
    "pipeline_corpus_prep",
    r"""
    WITH base AS (
      SELECT doc_id, lang, trim(regexp_replace(text, '\s+', ' ', 'g')) AS cleaned
      FROM documents
    ), feats AS (
      SELECT doc_id, lang, cleaned,
             len(string_split(cleaned, ' ')) AS n_tokens,
             md5(cleaned) AS fp
      FROM base
    ), canon AS (
      SELECT doc_id, lang, n_tokens, fp,
             MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id
      FROM feats
    )
    SELECT doc_id, lang, n_tokens
    FROM canon
    WHERE doc_id = canonical_id AND n_tokens BETWEEN 20 AND 1000
    """,
)
def pipeline_corpus_prep(spark, sf_dir):
    """LLM-corpus preparation: clean → token profile → exact dedup
    (canonical survivor) → length-window quality filter — the minimal
    pretraining-data pass, one lazy plan."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    cleaned = d.select(
        "doc_id", "lang", collapse_whitespace(F.col("text")).alias("cleaned")
    )
    feats = cleaned.withColumn("n_tokens", T.token_count("cleaned"))
    dups = DD.exact_duplicates(feats, "doc_id", "cleaned")
    out = (
        feats.join(dups.select("doc_id", "is_duplicate"), "doc_id")
        .filter(
            (F.col("is_duplicate") == 0)
            & F.col("n_tokens").between(20, 1000)
        )
    )
    return out.select("doc_id", "lang", "n_tokens")
