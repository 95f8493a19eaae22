"""SFT chat-template dataset prep (operators/sft.py) — rendering
exactness, dedup/filter/split semantics, template registry."""

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.operators import sft as SFT


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(
        [
            (1, "how do I restart", "reboot the node"),
            (2, "how do I restart", "reboot the node"),  # exact dup pair
            (3, "disk is full", "clean the cache"),
            (4, None, "orphan answer"),
            (5, "orphan question", ""),
        ],
        "id long, q string, a string",
    )


def test_render_chat_zephyr_exact(spark):
    df = spark.createDataFrame([("hi", "hello")], "q string, a string")
    out = df.select(
        SFT.render_chat("zephyr", "sys", F.col("q"), F.col("a")).alias("t")
    ).first()["t"]
    assert out == "<|system|>\nsys</s>\n<|user|>\nhi</s>\n<|assistant|>\nhello</s>"


def test_render_chat_all_templates_contain_parts(spark):
    df = spark.createDataFrame([("QQ", "AA")], "q string, a string")
    for name in SFT.CHAT_TEMPLATES:
        out = df.select(
            SFT.render_chat(name, "SS", F.col("q"), F.col("a")).alias("t")
        ).first()["t"]
        assert "QQ" in out and "AA" in out, name


def test_render_chat_custom_template(spark):
    df = spark.createDataFrame([("q1", "a1")], "q string, a string")
    out = df.select(
        SFT.render_chat("Q:{usr} A:{asst}", "", F.col("q"), F.col("a")).alias("t")
    ).first()["t"]
    assert out == "Q:q1 A:a1"


def test_chat_messages_struct(spark):
    df = spark.createDataFrame([("u", "a")], "q string, a string")
    row = df.select(
        SFT.chat_messages("s", F.col("q"), F.col("a")).alias("m")
    ).first()["m"]
    assert [m["role"] for m in row] == ["system", "user", "assistant"]
    assert [m["content"] for m in row] == ["s", "u", "a"]


def test_sft_prepare_dedups_and_filters(spark, pairs):
    out = SFT.sft_prepare(pairs, "q", "a", template="qa_markers").collect()
    # dup pair collapsed (min id survives), null q and empty a dropped
    assert len(out) == 2
    by_q = {r["q"]: r for r in out}
    assert by_q["how do I restart"]["id"] == 1
    assert set(r["split"] for r in out) <= {0, 1}
    assert all(r["n_tokens"] > 0 for r in out)


def test_sft_prepare_token_budget(spark, pairs):
    out = SFT.sft_prepare(pairs, "q", "a", template="qa_markers", max_tokens=3)
    assert out.count() == 0  # every rendered row exceeds 3 ws-tokens


def test_sft_prepare_split_deterministic(spark, pairs):
    a = {r["id"]: r["split"] for r in SFT.sft_prepare(pairs, "q", "a").collect()}
    b = {r["id"]: r["split"] for r in SFT.sft_prepare(pairs, "q", "a").collect()}
    assert a == b
