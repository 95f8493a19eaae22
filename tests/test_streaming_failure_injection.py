"""Failure-injection tests for the exactly-once streaming sinks.

The restart tests elsewhere verify clean stop/start; these pin the
UGLIEST crash boundaries the replay contract must survive:

- sink committed, streaming checkpoint UNACKNOWLEDGED (the commit file
  is deleted to simulate a crash in that window) → the replayed batch
  must be SKIPPED (no duplicate txlog commit / no double-fold);
- crash MID-sink — data files staged but the commit record / publish
  rename never happened → the replayed batch must RE-APPLY and the
  half-written attempt must be invisible to readers throughout.
"""

import glob
import os

import pytest


def _write_csv(path, rows, header):
    with open(path, "w") as f:
        f.write(header + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def _drop_latest_checkpoint_commit(ckpt: str) -> int:
    """Simulate a crash between sink commit and checkpoint ack: remove
    the newest commits/<N> file so Structured Streaming replays batch N
    on restart."""
    commits = sorted(
        (int(os.path.basename(p)) for p in glob.glob(os.path.join(ckpt, "commits", "*"))
         if os.path.basename(p).isdigit()),
    )
    assert commits, "no checkpoint commits written"
    latest = commits[-1]
    os.remove(os.path.join(ckpt, "commits", str(latest)))
    crc = os.path.join(ckpt, "commits", f".{latest}.crc")
    if os.path.exists(crc):  # hadoop checksum sidecar blocks the re-write
        os.remove(crc)
    return latest


def _stream(spark, landing):
    return (
        spark.readStream.format("csv")
        .schema("k long, v string")
        .option("header", "true")
        .option("maxFilesPerTrigger", "1")
        .load(landing)
    )


def test_upsert_txlog_replay_after_lost_checkpoint_ack(spark, tmp_path):
    from azuredataengineering_deeplearning_spark.sources import txlog as TX
    from azuredataengineering_deeplearning_spark.streaming.upsert import (
        stream_upsert_txlog,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "tx")
    os.makedirs(landing)
    # sequence the two batches explicitly (the file source does not
    # guarantee processing order for files that pre-exist the stream)
    _write_csv(f"{landing}/b1.csv", [(1, "a"), (2, "b")], "k,v")
    q = stream_upsert_txlog(_stream(spark, landing), table, ["k"], ckpt)
    try:
        q.processAllAvailable()
        _write_csv(f"{landing}/b2.csv", [(2, "b2"), (3, "c")], "k,v")
        q.processAllAvailable()
    finally:
        q.stop()
    want = {1: "a", 2: "b2", 3: "c"}
    assert {r.k: r.v for r in TX.read(spark, table).collect()} == want
    versions_before = TX._versions(table)

    # crash window: sink committed batch N, checkpoint ack lost
    replayed = _drop_latest_checkpoint_commit(ckpt)
    q2 = stream_upsert_txlog(_stream(spark, landing), table, ["k"], ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # the replayed batch_id is already in the log -> fold skipped it:
    # no new commit, no content change, no duplicate batch_id
    assert TX._versions(table) == versions_before
    assert {r.k: r.v for r in TX.read(spark, table).collect()} == want
    ids = [
        TX._read_commit(table, v).get("batch_id") for v in TX._versions(table)
    ]
    assert ids.count(replayed) == 1


def test_upsert_txlog_crash_before_commit_record(spark, tmp_path, monkeypatch):
    from azuredataengineering_deeplearning_spark.sources import txlog as TX
    from azuredataengineering_deeplearning_spark.streaming.upsert import (
        stream_upsert_txlog,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "tx")
    os.makedirs(landing)
    _write_csv(f"{landing}/b1.csv", [(1, "a"), (2, "b")], "k,v")

    q = stream_upsert_txlog(_stream(spark, landing), table, ["k"], ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    after_b1 = {r.k: r.v for r in TX.read(spark, table).collect()}
    versions_b1 = TX._versions(table)

    # batch 2 crashes AFTER staging data files into the table root but
    # BEFORE the commit record claims a version — the ugliest boundary:
    # orphaned data files exist, the log says nothing happened
    _write_csv(f"{landing}/b2.csv", [(2, "b2"), (3, "c")], "k,v")
    real_try_commit = TX._try_commit
    boom = {"armed": True}

    def dying_commit(path, version, actions):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before commit record")
        return real_try_commit(path, version, actions)

    monkeypatch.setattr(TX, "_try_commit", dying_commit)
    q2 = stream_upsert_txlog(_stream(spark, landing), table, ["k"], ckpt)
    with pytest.raises(Exception):
        q2.processAllAvailable()
    q2.stop()
    # the injection must actually have fired — otherwise the raises
    # block proved nothing (a sentinel raise INSIDE pytest.raises is
    # swallowed and makes the assertion vacuous)
    assert not boom["armed"], "injected crash never fired"

    # half-written attempt is invisible: same versions, same content
    assert TX._versions(table) == versions_b1
    assert {r.k: r.v for r in TX.read(spark, table).collect()} == after_b1

    # restart (patch disarmed): the unacknowledged batch replays and
    # APPLIES this time — exactly once overall
    q3 = stream_upsert_txlog(_stream(spark, landing), table, ["k"], ckpt)
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    assert {r.k: r.v for r in TX.read(spark, table).collect()} == {
        1: "a", 2: "b2", 3: "c",
    }
    ids = [
        TX._read_commit(table, v).get("batch_id") for v in TX._versions(table)
    ]
    assert len(ids) == len(set(ids)), f"duplicate batch commit: {ids}"


def test_rollup_replay_after_lost_checkpoint_ack(spark, tmp_path):
    from azuredataengineering_deeplearning_spark.operators.incremental import (
        finalize_state,
    )
    from azuredataengineering_deeplearning_spark.streaming import stream_rollup

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    spec = {"n": ("count", None), "s": ("sum", "v")}
    _write_csv(f"{landing}/b1.csv", [("a", 1.0), ("b", 10.0)], "k,v")

    def start():
        return stream_rollup(
            spark.readStream.schema("k string, v double")
            .option("header", "true")
            .option("maxFilesPerTrigger", "1")
            .csv(landing),
            ["k"],
            spec,
            state,
            ckpt,
        )

    q = start()
    try:
        q.processAllAvailable()
        _write_csv(f"{landing}/b2.csv", [("a", 4.0)], "k,v")
        q.processAllAvailable()
    finally:
        q.stop()
    want = {("a", 2, 5.0), ("b", 1, 10.0)}

    def got():
        return {
            (r["k"], r["n"], r["s"])
            for r in finalize_state(spark.read.parquet(state), spec).collect()
        }

    assert got() == want

    # crash window: state published (marker inside), checkpoint ack lost
    _drop_latest_checkpoint_commit(ckpt)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # the replayed fold saw its _applied_<id> marker and returned —
    # an additive sink would otherwise double-count batch 2
    assert got() == want


def test_rollup_crash_between_swap_and_publish(spark, tmp_path, monkeypatch):
    from azuredataengineering_deeplearning_spark.operators.incremental import (
        finalize_state,
    )
    from azuredataengineering_deeplearning_spark.streaming import rollup as R

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    spec = {"n": ("count", None), "s": ("sum", "v")}
    _write_csv(f"{landing}/b1.csv", [("a", 1.0), ("b", 10.0)], "k,v")

    def start():
        return R.stream_rollup(
            spark.readStream.schema("k string, v double")
            .option("header", "true")
            .option("maxFilesPerTrigger", "1")
            .csv(landing),
            ["k"],
            spec,
            state,
            ckpt,
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batch 2: crash AFTER the live state is moved aside but BEFORE the
    # staged replacement is published — the state path does not exist at
    # crash time; recovery must first put the old state back, then the
    # replayed fold applies batch 2 exactly once
    _write_csv(f"{landing}/b2.csv", [("a", 4.0)], "k,v")
    real_rename = os.rename
    boom = {"armed": True}

    def dying_rename(src, dst):
        if boom["armed"] and src.endswith("__staging_1") and dst == state:
            boom["armed"] = False
            raise RuntimeError("injected crash before state publish")
        return real_rename(src, dst)

    monkeypatch.setattr(R.os, "rename", dying_rename)
    q2 = start()
    with pytest.raises(Exception):
        q2.processAllAvailable()
    q2.stop()
    assert not boom["armed"], "injected crash never fired"
    monkeypatch.setattr(R.os, "rename", real_rename)

    q3 = start()
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    got = {
        (r["k"], r["n"], r["s"])
        for r in finalize_state(spark.read.parquet(state), spec).collect()
    }
    assert got == {("a", 2, 5.0), ("b", 1, 10.0)}
    # exactly one applied marker for the replayed batch
    assert len(glob.glob(os.path.join(state, "_applied_1"))) == 1
