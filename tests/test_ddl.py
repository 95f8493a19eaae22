from azuredataengineering_deeplearning_spark.sources import ddl as D


def test_medallion_tiers():
    out = D.medallion_ddl("Resource", {"ID": "bigint", "Name": "string"})
    assert set(out) == {"Bronze", "Silver", "Gold"}
    assert "sourceFile string" in out["Bronze"]
    assert "ResourceKey bigint GENERATED ALWAYS AS IDENTITY" in out["Silver"]
    assert "currentVersion tinyint" in out["Silver"]
    assert "effectiveDate int" in out["Silver"]
    assert "delta.enableChangeDataFeed" in out["Gold"]
    assert "dsilver.Resource" in out["Silver"]


def test_quoted_column_names():
    sql = D.tier_ddl("T", {"System.ChangedDate": "timestamp"}, "Bronze")
    assert "`System.ChangedDate` timestamp" in sql


def test_deep_clone():
    sql = D.deep_clone_ddl("Resource", "dev_dgold", "prd_dgold")
    assert "DEEP CLONE dev_dgold.Resource" in sql


def test_varchar_plan_and_distribution(spark):
    df = spark.createDataFrame(
        [("short", "x" * 9000, 1.5, True)],
        "a string, b string, m double, f boolean",
    )
    plan = D.plan_varchar_ddl(df)
    assert plan["a"] == "varchar(10)"  # 5 + 5 headroom
    assert plan["b"] == "varchar(max)"
    assert plan["m"] == "float" and plan["f"] == "bit"

    small = D.export_table_ddl("t", plan, n_rows=1000)
    assert "REPLICATE" in small and "HEAP" in small
    big_plan = {k: v for k, v in plan.items() if v != "varchar(max)"}
    big = D.export_table_ddl("t", big_plan, n_rows=70_000_000)
    assert "CLUSTERED COLUMNSTORE INDEX" in big and "HASH(" in big
    # varchar(max) forces the small path even at columnstore scale
    assert "HEAP" in D.export_table_ddl("t", plan, n_rows=70_000_000)


def test_truncate_for_export(spark):
    df = spark.createDataFrame([("y" * 400_100,)], "b string")
    out = D.truncate_for_export(df, {"b": "varchar(max)"})
    assert len(out.collect()[0].b) == 400_000


def test_date_view_ddl_sentinel_guard():
    from azuredataengineering_deeplearning_spark.sources.ddl import date_view_ddl

    sql = date_view_ddl(
        "gold.v_orders", "gold.orders",
        ["orderId", "amount"], ["orderDateKey", "shipDateKey"],
    )
    assert sql.startswith("CREATE VIEW gold.v_orders AS")
    assert sql.count("LEFT JOIN dim.Date") == 2
    # sentinel keys (0 / -9999) must never match the calendar
    assert "CASE WHEN t.orderDateKey > 0 THEN t.orderDateKey END = d0.dateKey" in sql
    assert "CASE WHEN t.shipDateKey > 0 THEN t.shipDateKey END = d1.dateKey" in sql
