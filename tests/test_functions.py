import datetime

from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.functions import dates as D
from azuredataengineering_deeplearning_spark.functions import strings as S


def test_fiscal_calendar(spark):
    df = spark.createDataFrame(
        [(datetime.date(2024, 7, 1),), (datetime.date(2024, 6, 30),),
         (datetime.date(2025, 1, 15),), (datetime.date(2024, 12, 31),)],
        "d date",
    )
    rows = df.select(
        D.fiscal_year("d").alias("fy"), D.fiscal_quarter("d").alias("fq")
    ).collect()
    # Jul 2024 → FY25 Q1; Jun 2024 → FY24 Q4; Jan 2025 → FY25 Q3; Dec 2024 → FY25 Q2
    assert [(r.fy, r.fq) for r in rows] == [(2025, 1), (2024, 4), (2025, 3), (2025, 2)]


def test_work_week_and_outlook_week(spark):
    df = spark.createDataFrame([(datetime.date(2024, 1, 1),)], "d date")
    r = df.select(
        D.work_week_label("d").alias("ww"), D.outlook_week("d").alias("ow")
    ).collect()[0]
    assert r.ww == "24ww1.1"  # 2024-01-01 is a Monday, ISO week 1
    assert r.ow == 1


def test_date_key_sentinels(spark):
    df = spark.createDataFrame([(datetime.date(2024, 3, 5),), (None,)], "d date")
    vals = [r.k for r in df.select(D.date_key_or_sentinel("d").alias("k")).collect()]
    assert vals == [20240305, -9999]


def test_clean_text(spark):
    df = spark.createDataFrame([("<b>hello</b>   world\n\tfoo",)], "t string")
    assert df.select(S.clean_text("t").alias("c")).collect()[0].c == "hello world foo"


def test_normalize_column_names():
    m = S.normalize_column_names(["System.ChangedDate", "work end-date", "ID"])
    assert m["System.ChangedDate"] == "systemChangeddate"
    assert m["work end-date"] == "workEndDate"
    assert m["ID"] == "id"


def test_quote_if_needed():
    assert S.quote_if_needed("a.b") == "`a.b`"
    assert S.quote_if_needed("plain") == "plain"


def test_concat_kv(spark):
    df = spark.createDataFrame([("en", 5)], "lang string, n int")
    out = df.select(S.concat_kv([("lang", "lang"), ("n", "n")]).alias("p")).collect()[0].p
    assert out == "lang: en | n: 5"


def test_entropy_matches_numpy(spark):
    import math

    from azuredataengineering_deeplearning_spark.operators.aggregates import entropy

    data = [("g", v) for v in ["a", "a", "b", "c", "c", "c"]]
    df = spark.createDataFrame(data, "k string, v string")
    got = entropy(df, ["k"], "v").collect()[0].entropy
    ps = [2 / 6, 1 / 6, 3 / 6]
    want = -sum(p * math.log(p) for p in ps)
    assert abs(got - want) < 1e-12
