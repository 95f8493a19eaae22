"""SQL front door: temp-view registration over the engine readers."""



def test_register_views_sql_front_door(spark):
    from azuredataengineering_deeplearning_spark.sources.readers import (
        register_views,
    )

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "orders" in names and "events" in names
    n = spark.sql("SELECT COUNT(*) AS n FROM orders").first()["n"]
    assert n > 0
    joined = spark.sql("""
        SELECT n_name, COUNT(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY c DESC LIMIT 3
    """).collect()
    assert len(joined) == 3
    # events view carries the ts normalization
    assert "ts" in spark.table("events").columns


def test_jdbc_staged_sink_statement_plan(spark):
    from pyspark.sql import functions as F

    from azuredataengineering_deeplearning_spark.sources.connectors import (
        JdbcStagedSink,
    )
    from azuredataengineering_deeplearning_spark.sources.ddl import (
        plan_varchar_ddl,
    )

    df = spark.range(10).select(
        F.col("id").alias("k"), F.lit("x").alias("name")
    )
    executed = []
    sink = JdbcStagedSink(url=None, table="dim.Widget", executor=executed.append)
    plan = plan_varchar_ddl(df)
    stmts = sink.write(df, plan)
    assert stmts == executed
    # workflow shape: drop stale staging, create, drop stale old,
    # swap current->old, staging->current, drop old
    assert "DROP TABLE [dim.Widget__staging]" in stmts[0]
    assert stmts[1].startswith("CREATE TABLE dim.Widget__staging")
    assert "REPLICATE" in stmts[1]  # small table -> replicate+heap
    assert "sp_rename 'dim.Widget', 'dim.Widget__old'" in stmts[3]
    assert "sp_rename 'dim.Widget__staging', 'dim.Widget'" in stmts[4]
    assert stmts[5].endswith("DROP TABLE [dim.Widget__old]")
