"""KQL pipes over Structured Streaming: the translator emits plain
Catalyst expressions, so stateless stages (where/extend/project/
parse/term operators) and windowed summarize run unchanged on a
streaming DataFrame — a Kusto-shaped pipeline pointed at a live file
feed instead of Kusto. Round-9 bridge tests."""

import os

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _write_csv(path, rows, header):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return {
        "landing": str(tmp_path / "landing"),
        "checkpoint": str(tmp_path / "ckpt"),
    }


def test_stateless_kql_pipe_on_stream(spark, dirs):
    _write_csv(
        f"{dirs['landing']}/a.csv",
        [
            (1, "2024-01-01 00:00:00", "click", 5.0),
            (2, "2024-01-01 00:10:00", "view", 1.0),
            (3, "2024-01-01 01:00:00", "click", 9.0),
        ],
        header="event_id,ts,event_type,value",
    )
    stream = (
        spark.readStream.format("csv")
        .schema("event_id long, ts timestamp, event_type string, value double")
        .option("header", "true")
        .load(dirs["landing"])
    )
    out = kql_to_df(
        {"events": stream},
        "events | where event_type has 'click' and value > 2"
        " | extend v2 = value * 2, tag = strcat(event_type, '!')"
        " | project event_id, v2, tag",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("kql_stateless")
        .outputMode("append")
        .option("checkpointLocation", dirs["checkpoint"])
        .start()
    )
    q.processAllAvailable()
    rows = sorted(
        (r.event_id, r.v2, r.tag)
        for r in spark.sql("SELECT * FROM kql_stateless").collect()
    )
    q.stop()
    assert rows == [(1, 10.0, "click!"), (3, 18.0, "click!")]


def test_kql_binned_summarize_on_stream(spark, dirs):
    _write_csv(
        f"{dirs['landing']}/b.csv",
        [
            (1, "2024-01-01 00:05:00", "click", 5.0),
            (2, "2024-01-01 00:40:00", "click", 1.0),
            (3, "2024-01-01 01:10:00", "view", 9.0),
        ],
        header="event_id,ts,event_type,value",
    )
    stream = (
        spark.readStream.format("csv")
        .schema("event_id long, ts timestamp, event_type string, value double")
        .option("header", "true")
        .load(dirs["landing"])
    )
    # bin(ts, 1h) compiles to epoch-aligned floor — a valid streaming
    # group key (complete mode; for append mode use watermarked window())
    out = kql_to_df(
        {"events": stream},
        "events | summarize n = count(), total = sum(value)"
        " by hour = bin(ts, 1h), event_type",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("kql_binned")
        .outputMode("complete")
        .option("checkpointLocation", dirs["checkpoint"])
        .start()
    )
    q.processAllAvailable()
    rows = {
        (str(r.hour), r.event_type): (r.n, r.total)
        for r in spark.sql("SELECT * FROM kql_binned").collect()
    }
    q.stop()
    assert rows == {
        ("2024-01-01 00:00:00", "click"): (2, 6.0),
        ("2024-01-01 01:00:00", "view"): (1, 9.0),
    }


def test_kql_arg_max_stream_equals_batch(spark, dirs):
    """`summarize arg_max(Rev, *) by Key` (daily_eval.py:158's shape) on
    a stream rides a max_by streaming aggregate; the batch plan is a
    row_number window. Same pipe, both engines' faces, same result."""
    rows = [
        (1, "2024-01-01 00:05:00", "click", 5.0),
        (2, "2024-01-01 00:40:00", "click", 8.0),
        (3, "2024-01-01 01:10:00", "view", 9.0),
        (4, "2024-01-01 01:20:00", "view", 2.0),
        (5, "2024-01-01 01:30:00", "scroll", 1.0),
    ]
    _write_csv(f"{dirs['landing']}/c.csv", rows, header="event_id,ts,event_type,value")
    schema = "event_id long, ts timestamp, event_type string, value double"
    pipe = (
        "events | where value > 0"
        " | summarize arg_max(value, *) by event_type"
    )
    stream = (
        spark.readStream.format("csv")
        .schema(schema)
        .option("header", "true")
        .load(dirs["landing"])
        .withWatermark("ts", "1 hour")
    )
    out = kql_to_df({"events": stream}, pipe)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("kql_argmax")
        .outputMode("complete")
        .option("checkpointLocation", dirs["checkpoint"])
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (r.event_id, r.event_type, r.value)
        for r in spark.sql("SELECT * FROM kql_argmax").collect()
    )
    q.stop()

    batch = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", "true")
        .load(dirs["landing"])
    )
    want = sorted(
        (r.event_id, r.event_type, r.value)
        for r in kql_to_df({"events": batch}, pipe).collect()
    )
    assert got == want == [(2, "click", 8.0), (3, "view", 9.0), (5, "scroll", 1.0)]


def test_kql_arg_min_on_stream(spark, dirs):
    _write_csv(
        f"{dirs['landing']}/d.csv",
        [
            (1, "2024-01-01 00:05:00", "click", 5.0),
            (2, "2024-01-01 00:40:00", "click", 8.0),
        ],
        header="event_id,ts,event_type,value",
    )
    stream = (
        spark.readStream.format("csv")
        .schema("event_id long, ts timestamp, event_type string, value double")
        .option("header", "true")
        .load(dirs["landing"])
    )
    out = kql_to_df(
        {"events": stream}, "events | summarize arg_min(value, *) by event_type"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("kql_argmin")
        .outputMode("complete")
        .option("checkpointLocation", dirs["checkpoint"])
        .start()
    )
    q.processAllAvailable()
    rows = [
        (r.event_id, r.value)
        for r in spark.sql("SELECT * FROM kql_argmin").collect()
    ]
    q.stop()
    assert rows == [(1, 5.0)]


import pytest as _pytest


@_pytest.mark.parametrize(
    "stage",
    [
        "sort by value desc",
        "order by value",
        "top 3 by value",
        "top-nested 2 of event_type by sum(value)",
        "top-hitters 3 of event_type",
        "partition by event_type (top 1 by value)",
        "evaluate pivot(event_type, sum(value))",
        "sample 3",
        "serialize rn = row_number()",
    ],
)
def test_kql_unsupported_stages_raise_loudly_on_streams(spark, dirs, stage):
    """The enumerated error set (verdict r10 #4): total-order / bounded-
    snapshot stages must fail at PLAN BUILD on a streaming input, not
    surface as an opaque AnalysisException at query start."""
    _write_csv(
        f"{dirs['landing']}/e.csv",
        [(1, "2024-01-01 00:05:00", "click", 5.0)],
        header="event_id,ts,event_type,value",
    )
    stream = (
        spark.readStream.format("csv")
        .schema("event_id long, ts timestamp, event_type string, value double")
        .option("header", "true")
        .load(dirs["landing"])
    )
    with _pytest.raises(ValueError, match="STREAMING"):
        kql_to_df({"events": stream}, f"events | {stage}")
