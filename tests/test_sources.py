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
