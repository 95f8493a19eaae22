import json

from azuredataengineering_deeplearning_spark.functions import jsonx as JX


def test_combine_json_arrays(spark):
    rows = [
        (1, '[{"a": 1}, {"a": 2}]'),
        (1, '[{"a": 3}]'),
        (2, '[{"a": 9}]'),
    ]
    df = spark.createDataFrame(rows, "k int, payload string")
    out = {
        r.k: json.loads(r.combined)
        for r in JX.combine_json_arrays(
            df, ["k"], "payload", "struct<a: int>"
        ).collect()
    }
    assert sorted(d["a"] for d in out[1]) == [1, 2, 3]
    assert out[2] == [{"a": 9}]


def test_array_to_columns(spark):
    df = spark.createDataFrame([(1, [10.0, 20.0, 30.0])], "id int, v array<double>")
    row = JX.array_to_columns(df, "v", 3, "v_").collect()[0]
    assert (row.v_0, row.v_1, row.v_2) == (10.0, 20.0, 30.0)
