import pyspark.sql.functions as F

import __spark_entry__ as E


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"n_name", "revenue", "n_items"}


def test_queries_have_matching_oracle_keys():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 10


def test_flagship_filter_pushdown(spark, sf_dir):
    from azuredataengineering_deeplearning_spark.sources.readers import read_parquet

    df = read_parquet(
        spark,
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"],
        predicate=F.col("l_quantity") > 45,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    assert "l_orderkey" in plan


def test_events_ns_timestamps(spark, sf_dir):
    from azuredataengineering_deeplearning_spark.sources.readers import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert dict(ev.dtypes)["ts_ns"] == "bigint"
    assert ev.count() > 0
