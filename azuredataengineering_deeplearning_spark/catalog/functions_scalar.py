"""Catalog: scalar string/date/math/JSON/array functions F1-F22."""

from __future__ import annotations

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.catalog import query
from azuredataengineering_deeplearning_spark.functions import dates as D
from azuredataengineering_deeplearning_spark.functions import jsonx as JX
from azuredataengineering_deeplearning_spark.functions import mathx as M
from azuredataengineering_deeplearning_spark.functions import strings as S
from azuredataengineering_deeplearning_spark.sources.readers import load_tables, read_parquet


@query(
    "f1_regex_scrub",
    r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, 'spark|vector', 'X', 'g'), '\s+', ' ', 'g')) AS cleaned
    FROM documents
    """,
)
def f1_regex_scrub(spark, sf_dir):
    """F1/F5: regex replace + whitespace collapse + trim chain."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return d.select(
        "doc_id",
        S.collapse_whitespace(S.regex_scrub("text", "spark|vector", "X")).alias("cleaned"),
    )


@query(
    "f2_regex_extract",
    """
    SELECT doc_id, COALESCE(regexp_extract(source, '\\d+'), '') AS src_num
    FROM documents
    """,
)
def f2_regex_extract(spark, sf_dir):
    """F2: regexp_extract of the numeric id (``MSF-\\d{6}`` pattern shape)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    return d.select("doc_id", S.regex_extract("source", r"\d+").alias("src_num"))


@query(
    "f3_split_part",
    """
    SELECT o_orderkey, string_split(o_orderpriority, '-')[1] AS prio_code
    FROM orders
    """,
)
def f3_split_part(spark, sf_dir):
    """F3: split + element access (``spark_stream.py:23`` path parsing)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    return o.select("o_orderkey", S.split_part("o_orderpriority", "-", 0).alias("prio_code"))


@query(
    "f4_truncate_chars",
    """
    SELECT doc_id, LENGTH(text) AS n, substr(text, 1, 50) AS head
    FROM documents WHERE LENGTH(text) > 50
    """,
)
def f4_truncate_chars(spark, sf_dir):
    """F4: substring/length guard (``databricks_synapse_sql_writer.py:318-321``)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (
        d.filter(F.length("text") > 50)
        .select(
            "doc_id",
            F.length("text").alias("n"),
            S.truncate_chars("text", 50).alias("head"),
        )
    )


@query(
    "f7_concat_kv",
    """
    SELECT doc_id, concat_ws(' | ',
             concat_ws(': ', 'lang', lang),
             concat_ws(': ', 'source', source),
             concat_ws(': ', 'n_chars', CAST(n_chars AS VARCHAR))) AS prompt
    FROM documents
    """,
)
def f7_concat_kv(spark, sf_dir):
    """F7: 'k: v' prompt assembly as pure concat_ws — replaces the
    reference's row UDF (``parallel_sentence_embedding_databricks.py:10-33``)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        S.concat_kv(
            [("lang", "lang"), ("source", "source"), ("n_chars", "n_chars")]
        ).alias("prompt"),
    )


@query(
    "f8_date_key",
    """
    SELECT o_orderkey, CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_datekey
    FROM orders
    """,
)
def f8_date_key(spark, sf_dir):
    """F8: yyyyMMdd int date key (``apply_scd2.py:34-35``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select("o_orderkey", D.date_key("o_orderdate").alias("order_datekey"))


@query(
    "f9_month_snap",
    """
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate - INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS minus_30d
    FROM orders
    """,
)
def f9_month_snap(spark, sf_dir):
    """F9: month-end snap / month truncation / date_sub."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select(
        "o_orderkey",
        D.month_end("o_orderdate").cast("timestamp").alias("month_end"),
        D.month_start("o_orderdate").cast("timestamp").alias("month_start"),
        F.date_sub("o_orderdate", 30).cast("timestamp").alias("minus_30d"),
    )


@query(
    "f10_timestamp_roundtrip",
    """
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed
    FROM orders
    """,
)
def f10_timestamp_roundtrip(spark, sf_dir):
    """F10: format → parse round trip (mixed-format parsing path,
    ``generate_data.py:104-106``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select(
        "o_orderkey",
        F.to_timestamp(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).alias("parsed"),
    )


@query(
    "f11_duration_hours",
    """
    SELECT l_orderkey, l_linenumber,
           (epoch(l_shipdate) - epoch(o_orderdate)) / 3600.0 AS hours_to_ship
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def f11_duration_hours(spark, sf_dir):
    """F11: float hours between timestamps across a join
    (``generate_data.py:190``)."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    j = t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
    return j.select(
        "l_orderkey",
        "l_linenumber",
        D.duration_hours("o_orderdate", "l_shipdate").alias("hours_to_ship"),
    )


@query(
    "f12_calendar_attributes",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           weekofyear(o_orderdate) AS iso_week,
           isodow(o_orderdate) AS iso_dow,
           dayofmonth(o_orderdate) AS dom,
           dayofyear(o_orderdate) AS doy,
           dayname(o_orderdate) AS day_name
    FROM orders
    """,
)
def f12_calendar_attributes(spark, sf_dir):
    """F12: calendar attribute extraction (``dim_date_generator.py:74-94``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        D.iso_weekday("o_orderdate").alias("iso_dow"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format("o_orderdate", "EEEE").alias("day_name"),
    )


@query(
    "f13_fiscal_calendar",
    """
    SELECT o_orderkey,
           year(o_orderdate) + CASE WHEN month(o_orderdate) >= 7 THEN 1 ELSE 0 END AS fy,
           -- NB: DuckDB CAST(double AS INT) *rounds*; Spark truncates → FLOOR
           CAST(FLOOR(((month(o_orderdate) - 7 + 12) % 12) / 3) AS INT) + 1 AS fq,
           printf('Q%dFY%02d',
                  CAST(FLOOR(((month(o_orderdate) - 7 + 12) % 12) / 3) AS INT) + 1,
                  (year(o_orderdate) + CASE WHEN month(o_orderdate) >= 7 THEN 1 ELSE 0 END) % 100
           ) AS fq_label
    FROM orders
    """,
)
def f13_fiscal_calendar(spark, sf_dir):
    """F13: July-start fiscal year/quarter + label
    (``dim_date_generator.py:95-102``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select(
        "o_orderkey",
        D.fiscal_year("o_orderdate").alias("fy"),
        D.fiscal_quarter("o_orderdate").alias("fq"),
        D.fiscal_quarter_label("o_orderdate").alias("fq_label"),
    )


@query(
    "f14_work_week_label",
    """
    SELECT o_orderkey,
           printf('%02dww%d.%d', year(o_orderdate) % 100,
                  weekofyear(o_orderdate), isodow(o_orderdate)) AS ww_label
    FROM orders
    """,
)
def f14_work_week_label(spark, sf_dir):
    """F14: ``{yy}ww{w}.{d}`` work-week label (``dim_date_generator.py:56-66``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select("o_orderkey", D.work_week_label("o_orderdate").alias("ww_label"))


@query(
    "f15_outlook_week",
    """
    SELECT o_orderkey,
           CAST(FLOOR(datediff('day',
                 date_trunc('year', o_orderdate) - INTERVAL (isodow(date_trunc('year', o_orderdate)) - 1) DAY,
                 o_orderdate) / 7) AS INT) + 1 AS outlook_week
    FROM orders
    """,
)
def f15_outlook_week(spark, sf_dir):
    """F15: Outlook week number, Monday-anchored year-boundary base day
    (``dim_date_generator.py:104-117``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select("o_orderkey", D.outlook_week("o_orderdate").alias("outlook_week"))


@query(
    "f17_weekend_flag",
    """
    SELECT o_orderkey, CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END AS is_weekend
    FROM orders
    """,
)
def f17_weekend_flag(spark, sf_dir):
    """F17: weekend flag (``dim_date_generator.py:91-94``)."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    return o.select("o_orderkey", D.is_weekend("o_orderdate").alias("is_weekend"))


@query(
    "f18_math_transforms",
    """
    SELECT o_orderkey,
           CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket,
           round(o_totalprice, 1) AS price_round,
           ln(1 + o_totalprice) AS price_log1p,
           exp(ln(1 + o_totalprice)) - 1 AS price_roundtrip
    FROM orders
    """,
)
def f18_math_transforms(spark, sf_dir):
    """F18: floor-div bucketing, round, log1p/expm1 pair."""
    o = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return o.select(
        "o_orderkey",
        M.salt_bucket("o_totalprice", 10000).alias("price_bucket"),
        F.round("o_totalprice", 1).alias("price_round"),
        M.log1p_target("o_totalprice").alias("price_log1p"),
        M.expm1_inverse(M.log1p_target("o_totalprice")).alias("price_roundtrip"),
    )


@query(
    "f18_factorize",
    """
    WITH src AS (
      SELECT event_id, CASE WHEN value > 50 THEN event_type END AS et FROM events
    ), c AS (
      SELECT et, CAST(DENSE_RANK() OVER (ORDER BY et) - 1 AS INT) AS et_code
      FROM (SELECT DISTINCT et FROM src WHERE et IS NOT NULL)
    )
    SELECT s.event_id, s.et, COALESCE(c.et_code, -1) AS et_code
    FROM src s LEFT JOIN c USING (et)
    """,
)
def f18_factorize(spark, sf_dir):
    """F18: ``pd.factorize`` analog (``azureml_ray_basic_functions.py:70``)
    — dense 0..N-1 codes in sorted value order via the range-partitioned
    surrogate-key path (never a global ``dense_rank``), NULL → -1. The
    CASE makes some categories NULL so the sentinel path is exercised
    by the oracle, not just by pytest."""
    ev = read_parquet(spark, f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"])
    src = ev.select(
        "event_id",
        F.when(F.col("value") > 50, F.col("event_type")).alias("et"),
    )
    return M.factorize(src, "et", "et_code")


@query(
    "f19_json_extract",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def f19_json_extract(spark, sf_dir):
    """F19: JSON scalar extraction from a string payload
    (``generate_data.py:150``)."""
    ev = read_parquet(spark, f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    return ev.select("event_id", JX.json_get("props", "$.k").cast("int").alias("k"))


@query(
    "f19d_variant_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.missing') AS INT) AS m
    FROM events
    """,
)
def f19d_variant_extract(spark, sf_dir):
    """F19 through Spark 4 VariantType: parse once to the binary variant
    encoding, then typed path gets (missing path → NULL via
    try_variant_get) — the scale path for payload columns read by many
    downstream extracts."""
    ev = read_parquet(spark, f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    v = JX.variant_parse("props")
    return ev.select(
        "event_id",
        JX.variant_extract(v, "$.k", "int").alias("k"),
        JX.variant_extract(v, "$.missing", "int").alias("m"),
    )


@query(
    "f19b_json_serialize",
    """
    SELECT doc_id, to_json(struct_pack(lang := lang, n_chars := n_chars)) AS payload
    FROM documents
    """,
)
def f19b_json_serialize(spark, sf_dir):
    """F19: re-serialize columns to a JSON payload (``json.dumps`` analog)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return d.select("doc_id", JX.json_serialize("lang", "n_chars").alias("payload"))


@query(
    "f20_array_index",
    """
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE) AS e0,
           CAST(embedding[2] AS DOUBLE) AS e1,
           CAST(embedding[64] AS DOUBLE) AS e63
    FROM embeddings
    """,
)
def f20_array_index(spark, sf_dir):
    """F20: array element → scalar columns (vector explode pattern,
    ``count_target_onehot_encoder_spark.py:186-193``)."""
    e = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    return e.select(
        "vec_id",
        JX.array_element("embedding", 0).cast("double").alias("e0"),
        JX.array_element("embedding", 1).cast("double").alias("e1"),
        JX.array_element("embedding", 63).cast("double").alias("e63"),
    )


@query(
    "f21_abs_error",
    """
    SELECT l_orderkey, l_linenumber, abs(l_extendedprice - l_quantity * 1000.0) AS err
    FROM lineitem
    """,
)
def f21_abs_error(spark, sf_dir):
    """F21: vectorized per-row absolute error (row-apply MAE replaced)."""
    li = read_parquet(
        spark, f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"],
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        M.abs_error(F.col("l_extendedprice"), F.col("l_quantity") * 1000.0).alias("err"),
    )


@query(
    "f22_null_masks",
    """
    SELECT doc_id,
           CASE WHEN regexp_extract(text, 'vector[a-z]+') = '' THEN NULL
                ELSE regexp_extract(text, 'vector[a-z]+') END AS maybe_match,
           CASE WHEN (CASE WHEN regexp_extract(text, 'vector[a-z]+') = '' THEN NULL
                ELSE regexp_extract(text, 'vector[a-z]+') END) IS NULL THEN 0 ELSE 1 END AS maybe_match_attnmask
    FROM documents
    """,
)
def f22_null_masks(spark, sf_dir):
    """F22: attention-mask null indicators (``discover_schema.py:16-17``)."""
    d = read_parquet(spark, f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ext = S.regex_extract("text", "vector[a-z]+")
    d = d.select(
        "doc_id", F.when(ext == "", None).otherwise(ext).alias("maybe_match")
    )
    return M.with_null_masks(d, ["maybe_match"]).withColumn(
        "maybe_match_attnmask", F.col("maybe_match_attnmask").cast("int")
    )


@query(
    "f19c_json_infer_parse",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def f19c_json_infer_parse(spark, sf_dir):
    """Schema-on-read for an embedded JSON column: infer the props
    schema from a bounded sample, then parse every row JVM-side with
    from_json (no Python in the row path)."""
    from azuredataengineering_deeplearning_spark.functions.jsonx import parse_json_column

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    parsed = parse_json_column(ev, "props", out="p")
    return parsed.select("event_id", F.col("p.k").cast("long").alias("k_val"))
