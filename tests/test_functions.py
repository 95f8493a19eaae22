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


def test_factorize_matches_pandas(spark):
    """pd.factorize parity: dense 0..N-1 codes in sorted value order,
    NULL -> -1 sentinel, idempotent across partition layouts."""
    import pandas as pd

    from azuredataengineering_deeplearning_spark.functions import mathx as M

    vals = ["b", "a", None, "c", "a", None, "b", "b"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, v string"
    ).repartition(5)
    out = {r.id: r.code for r in M.factorize(df, "v", "code").collect()}
    # sorted-order codes: a=0, b=1, c=2; null -> -1
    pd_codes, pd_uniques = pd.factorize(pd.array(vals), sort=True)
    expected = {i: int(c) for i, c in enumerate(pd_codes)}
    assert out == expected
    assert list(pd_uniques) == ["a", "b", "c"]


def test_factorize_dense_and_deterministic(spark):
    from azuredataengineering_deeplearning_spark.functions import mathx as M

    df = spark.range(0, 1000).withColumn("v", (F.col("id") % 37).cast("string"))
    got = M.factorize(df, "v", "code")
    codes = sorted({r.code for r in got.select("code").distinct().collect()})
    assert codes == list(range(37))  # dense 0..N-1, no gaps, no -1 (no nulls)
    # re-running on a different partitioning yields identical codes
    again = M.factorize(df.repartition(3), "v", "code")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))
