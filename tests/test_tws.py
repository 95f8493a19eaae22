"""transformWithState operators: processor logic against a fake state
handle (the streaming runtime needs protobuf, absent here — the
integration test self-skips until it's installed)."""

import pandas as pd
import pytest

from azuredataengineering_deeplearning_spark.streaming import tws


class FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.ttls = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return self.states.setdefault(name, FakeValueState())


def _run(proc, key, frames):
    return list(proc.handleInputRows(key, iter(frames), None))


def test_running_stats_accumulates_across_batches():
    proc = tws.RunningEntityStats("v")
    proc.init(FakeHandle())
    out1 = _run(proc, ("a",), [pd.DataFrame({"v": [1.0, 3.0]})])
    assert out1[0].iloc[0].to_dict() == {
        "key": "a", "cnt": 2, "total": 4.0, "mean": 2.0, "mn": 1.0, "mx": 3.0
    }
    # second micro-batch: state carries
    out2 = _run(proc, ("a",), [pd.DataFrame({"v": [5.0]})])
    assert out2[0].iloc[0].to_dict() == {
        "key": "a", "cnt": 3, "total": 9.0, "mean": 3.0, "mn": 1.0, "mx": 5.0
    }


def test_running_stats_ignores_nulls_and_empty_batches():
    proc = tws.RunningEntityStats("v")
    proc.init(FakeHandle())
    assert _run(proc, ("a",), [pd.DataFrame({"v": [None, None]})]) == []
    out = _run(proc, ("a",), [pd.DataFrame({"v": [None, 2.0]})])
    assert out[0].iloc[0]["cnt"] == 1


def test_seen_key_dedup_emits_first_only():
    handle = FakeHandle()
    proc = tws.SeenKeyDedup(["id", "payload"], ttl_ms=60_000)
    proc.init(handle)
    assert handle.ttls["seen"] == 60_000  # TTL reaches the state var
    out = _run(proc, ("k1",), [pd.DataFrame({"id": ["k1", "k1"], "payload": ["x", "y"]})])
    assert len(out) == 1 and out[0].iloc[0]["payload"] == "x"
    # repeat while marker alive -> dropped
    assert _run(proc, ("k1",), [pd.DataFrame({"id": ["k1"], "payload": ["z"]})]) == []
    # TTL expiry = state cleared -> passes again
    handle.states["seen"].clear()
    out3 = _run(proc, ("k1",), [pd.DataFrame({"id": ["k1"], "payload": ["z"]})])
    assert len(out3) == 1 and out3[0].iloc[0]["payload"] == "z"


def test_wrappers_gate_without_protobuf(spark):
    stream = spark.readStream.format("rate").load()
    if tws.tws_available():
        pytest.skip("protobuf present: gate inactive (integration covered)")
    with pytest.raises(NotImplementedError, match="protobuf"):
        tws.streaming_entity_stats(stream, "value", "value")


@pytest.mark.skipif(not tws.tws_available(), reason="needs protobuf runtime")
def test_streaming_entity_stats_end_to_end(spark, tmp_path):
    src, ck, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 2.0)], "key string, v double"
    ).write.mode("append").parquet(src)

    def run_once():
        q = (
            tws.streaming_entity_stats(
                spark.readStream.schema("key string, v double").parquet(src),
                "key", "v",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(180)

    run_once()
    got = {r["key"]: r["total"] for r in spark.read.parquet(out).collect()}
    assert got == {"a": 4.0, "b": 2.0}
    spark.createDataFrame([("a", 5.0)], "key string, v double").write.mode(
        "append"
    ).parquet(src)
    run_once()  # restart: lifetime totals carry through the checkpoint
    rows = spark.read.parquet(out).collect()
    assert max(r["total"] for r in rows if r["key"] == "a") == 9.0
