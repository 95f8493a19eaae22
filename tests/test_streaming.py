"""Streaming ingest: exactly-once across restart (SURVEY §5.4)."""

import os

import pyspark.sql.functions as F
import pytest

from azuredataengineering_deeplearning_spark.streaming import (
    run_until_drained,
    stream_file_ingest,
)

SCHEMA = "event_id long, ts timestamp, payload string"


def _write_csv(path, rows, header="event_id,ts,payload"):
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
        "out": str(tmp_path / "bronze"),
    }


def test_ingest_exactly_once_across_restart(spark, dirs):
    _write_csv(
        f"{dirs['landing']}/drop1_a.csv",
        [(1, "2024-01-01 00:00:00", "x"), (2, "2024-01-01 00:01:00", "y")],
    )
    q = stream_file_ingest(
        spark, dirs["landing"], SCHEMA, dirs["checkpoint"], dirs["out"]
    )
    run_until_drained(q)
    assert spark.read.parquet(dirs["out"]).count() == 2

    # new file arrives; a NEW query with the SAME checkpoint must ingest
    # only the new file (exactly-once over restart)
    _write_csv(f"{dirs['landing']}/drop2_b.csv", [(3, "2024-01-01 00:05:00", "z")])
    q2 = stream_file_ingest(
        spark, dirs["landing"], SCHEMA, dirs["checkpoint"], dirs["out"]
    )
    run_until_drained(q2)
    out = spark.read.parquet(dirs["out"])
    assert out.count() == 3
    assert out.select("event_id").distinct().count() == 3


def test_byte_bounded_trigger(spark, dirs):
    """T1 byte-trigger parity: a byte budget resolves to a file count
    and each micro-batch stays within it (on average file size)."""
    from azuredataengineering_deeplearning_spark.streaming import (
        files_per_trigger_for_bytes,
        stream_file_ingest_bytes,
    )

    rows = [(i, "2024-01-01 00:00:00", "p" * 20) for i in range(10)]
    for i in range(6):
        _write_csv(f"{dirs['landing']}/f{i}_a.csv", rows)
    sizes = [
        os.path.getsize(f"{dirs['landing']}/f{i}_a.csv") for i in range(6)
    ]
    mean = sum(sizes) // len(sizes)
    # budget for ~2 files per batch
    n = files_per_trigger_for_bytes(spark, dirs["landing"], mean * 2 + 1)
    assert n == 2
    # far-too-small budget still makes progress (1 file per batch)
    assert files_per_trigger_for_bytes(spark, dirs["landing"], 1) == 1

    q = stream_file_ingest_bytes(
        spark, dirs["landing"], SCHEMA, dirs["checkpoint"], dirs["out"],
        max_bytes_per_trigger=mean * 2 + 1,
    )
    run_until_drained(q)
    out = spark.read.parquet(dirs["out"])
    assert out.count() == 60
    # 6 files / 2 per trigger -> every batch ingested <= 2 files' rows
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 3
    assert max(p["numInputRows"] for p in batches) <= 20


def test_lineage_columns(spark, dirs):
    _write_csv(
        f"{dirs['landing']}/part1_x.csv", [(10, "2024-01-01 00:00:00", "p")]
    )
    # path position of the file name varies with tmpdir depth — compute it
    depth = len(f"{dirs['landing']}/f.csv".split("/")) - 1
    q = stream_file_ingest(
        spark,
        dirs["landing"],
        SCHEMA,
        dirs["checkpoint"],
        dirs["out"],
        path_partition_index=depth,
    )
    run_until_drained(q)
    row = spark.read.parquet(dirs["out"]).collect()[0]
    assert row.sourceFile.endswith("part1_x.csv")
    assert row.partitionName == "part1"  # token before '_'


def test_watermarked_session_stream(spark, dirs):
    """Session aggregation actually running in a streaming query."""
    from azuredataengineering_deeplearning_spark.streaming import session_agg

    _write_csv(
        f"{dirs['landing']}/s.csv",
        [
            (1, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 00:10:00", "a"),
            (3, "2024-01-01 05:00:00", "a"),
        ],
        header="event_id,ts,user",
    )
    stream = (
        spark.readStream.format("csv")
        .schema("event_id long, ts timestamp, user string")
        .option("header", "true")
        .load(dirs["landing"])
    )
    sessions = session_agg(
        stream, "ts", "1 hour", ["user"], [F.count(F.lit(1)).alias("n")],
        watermark="2 hours",
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", dirs["checkpoint"])
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM sess_out").collect()
    q.stop()
    ns = sorted(r.n for r in rows)
    assert ns == [1, 2]  # two sessions: events 1+2 (10 min apart), event 3


def test_stream_dedup_within_watermark(spark, dirs):
    from azuredataengineering_deeplearning_spark.streaming.dedup import stream_dedup

    # drop 1: event 1 twice (same microbatch) + event 2
    _write_csv(
        f"{dirs['landing']}/d1_a.csv",
        [
            (1, "2024-01-01 00:00:00", "x"),
            (1, "2024-01-01 00:00:30", "x-re"),
            (2, "2024-01-01 00:01:00", "y"),
        ],
    )
    src = (
        spark.readStream.format("csv")
        .schema(SCHEMA)
        .option("header", "true")
        .load(dirs["landing"])
    )
    deduped = stream_dedup(src, ["event_id"], ts_col="ts", within="10 minutes")
    q = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", dirs["checkpoint"])
        .start(dirs["out"])
    )
    run_until_drained(q)
    # drop 2 (new query, same checkpoint): event 2 re-delivered within
    # the horizon → dropped; event 3 is new → kept
    _write_csv(
        f"{dirs['landing']}/d2_b.csv",
        [(2, "2024-01-01 00:02:00", "y-re"), (3, "2024-01-01 00:03:00", "z")],
    )
    src2 = (
        spark.readStream.format("csv")
        .schema(SCHEMA)
        .option("header", "true")
        .load(dirs["landing"])
    )
    q2 = (
        stream_dedup(src2, ["event_id"], ts_col="ts", within="10 minutes")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", dirs["checkpoint"])
        .start(dirs["out"])
    )
    run_until_drained(q2)
    out = spark.read.parquet(dirs["out"])
    got = sorted(r.event_id for r in out.select("event_id").collect())
    assert got == [1, 2, 3]


def test_stream_dedup_batch_path(spark):
    from azuredataengineering_deeplearning_spark.streaming.dedup import stream_dedup

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], ["k", "v"]
    )
    assert stream_dedup(df, ["k"]).count() == 2


def test_stream_stream_join_watermarked(spark, tmp_path):
    """Two file streams joined on key within an event-time band: inner
    results match the batch band join, and the plan carries watermarks
    (bounded state)."""
    import os

    from azuredataengineering_deeplearning_spark.streaming.joins import (
        stream_stream_join,
    )

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(ldir), os.makedirs(rdir)
    # left: clicks at t=0s,100s; right: purchases at t=30s (in band of
    # both under +/-60s? 30-0=30 ok, 100-30=70 > 60 not in band), t=1000s
    B = 1_700_000_000  # away from epoch: ts=0 sits on the initial watermark
    with open(f"{ldir}/a.csv", "w") as f:
        f.write(f"k,lts\nu1,{B}\nu1,{B + 100}\n")
    with open(f"{rdir}/a.csv", "w") as f:
        f.write(f"k,rts\nu1,{B + 30}\nu1,{B + 1000}\n")

    def src(d, col):
        return (
            spark.readStream.format("csv")
            .schema(f"k string, {col} long")
            .option("header", "true")
            .load(d)
            .withColumn(col, F.timestamp_seconds(F.col(col)))
        )

    joined = stream_stream_join(
        src(ldir, "lts"), src(rdir, "rts"), ["k"], "lts", "rts",
        within="60 seconds", left_watermark="0 seconds", right_watermark="0 seconds",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        (r.k, int(r.lts.timestamp()) - B, int(r.rts.timestamp()) - B)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }
    # (100, 30) is out of band: |100 - 30| = 70s > 60s
    assert rows == {("u1", 0, 30)}, rows
    # the streaming plan must be stateful with event-time watermarks
    assert "EventTimeWatermark" in joined._jdf.queryExecution().analyzed().toString()


def test_evolving_ingest_widens_schema_across_generations(spark, tmp_path):
    import json as _json
    import os

    from azuredataengineering_deeplearning_spark.streaming.ingest import (
        EvolvingIngest,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(landing)
    with open(f"{landing}/b1.json", "w") as f:
        f.write(_json.dumps({"k": 1, "v": "a"}) + "\n")

    def to_parquet(batch_df, batch_id):
        batch_df.write.mode("append").option("mergeSchema", "true").parquet(sink)

    ing = EvolvingIngest(spark, landing, ckpt, to_parquet)
    assert ing.run_generation() is False  # first generation sets the schema
    # a file with a NEW column lands; next generation widens BEFORE reading
    with open(f"{landing}/b2.json", "w") as f:
        f.write(_json.dumps({"k": 2, "v": "b", "extra": 9}) + "\n")
    assert ing.run_generation() is True
    assert ing.generation == 2
    out = spark.read.option("mergeSchema", "true").parquet(sink)
    rows = {r.k: r for r in out.collect()}
    assert set(out.columns) >= {"k", "v", "extra"}
    assert rows[1].extra is None  # pre-evolution row: null backfill
    assert rows[2].extra == 9
    # idempotence: a third generation with nothing new ingests nothing more
    assert ing.run_generation() is False
    assert spark.read.option("mergeSchema", "true").parquet(sink).count() == 2
