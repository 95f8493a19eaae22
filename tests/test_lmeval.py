"""Structured-output evaluation (operators/lmeval.py)."""

import pytest

from azuredataengineering_deeplearning_spark.operators import lmeval as LE

SCHEMA = "array<struct<Action:string,ChimeraType:string>>"
ALLOWED = {"Action": ["Replace", "Reboot"], "ChimeraType": ["DIMM", "GPU"]}


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        # valid, exact match
        (1, '[{"Action":"Replace","ChimeraType":"DIMM"}]',
            '[{"Action":"Replace","ChimeraType":"DIMM"}]'),
        # valid, whitespace/key-order differences only -> still exact
        (2, '[{"ChimeraType": "GPU", "Action": "Reboot"}]',
            '[{"Action":"Reboot","ChimeraType":"GPU"}]'),
        # valid, wrong value + OOV action
        (3, '[{"Action":"Destroy","ChimeraType":"DIMM"}]',
            '[{"Action":"Replace","ChimeraType":"DIMM"}]'),
        # malformed JSON
        (4, '[{"Action":"Replace"', '[{"Action":"Replace","ChimeraType":"DIMM"}]'),
        # valid, two items, one OOV type
        (5, '[{"Action":"Replace","ChimeraType":"DIMM"},'
            '{"Action":"Reboot","ChimeraType":"Cable"}]',
            '[{"Action":"Replace","ChimeraType":"DIMM"}]'),
    ]
    df = spark.createDataFrame(rows, "id long, pred string, gold string")
    return {r["id"]: r for r in LE.structured_output_eval(
        df, "pred", "gold", SCHEMA, ALLOWED).collect()}


def test_validity_and_items(scored):
    assert scored[1]["is_valid_json"] and scored[1]["n_items"] == 1
    assert not scored[4]["is_valid_json"] and scored[4]["n_items"] == -1
    assert scored[5]["n_items"] == 2


def test_exact_match_is_semantic(scored):
    assert scored[1]["exact_match"]
    assert scored[2]["exact_match"]  # key order + whitespace ignored
    assert not scored[3]["exact_match"]
    assert not scored[4]["exact_match"]


def test_oov_counts(scored):
    assert scored[1]["oov_action"] == 0 and scored[1]["oov_chimeratype"] == 0
    assert scored[3]["oov_action"] == 1
    assert scored[5]["oov_chimeratype"] == 1
    assert scored[4]["oov_action"] is None  # invalid row -> null, not 0


def test_accuracy_summary(spark):
    df = spark.createDataFrame(
        [(1, '[{"Action":"Replace","ChimeraType":"DIMM"}]',
             '[{"Action":"Replace","ChimeraType":"DIMM"}]'),
         (2, 'oops', '[{"Action":"Reboot","ChimeraType":"GPU"}]')],
        "id long, pred string, gold string",
    )
    s = LE.structured_output_eval(df, "pred", "gold", SCHEMA, ALLOWED)
    r = LE.accuracy_summary(s).first()
    assert r["n"] == 2
    assert r["valid_rate"] == pytest.approx(0.5)
    assert r["exact_match_rate"] == pytest.approx(0.5)
    assert r["mean_items"] == pytest.approx(1.0)


def test_token_f1_hand_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c", "a b c"),          # perfect
            (2, "a a b", "a c"),            # overlap: min counts -> a:1 = 1
            (3, "", "a b"),                 # empty pred
            (4, "x y", "p q"),              # disjoint
        ],
        "id long, pred string, gold string",
    )
    r = {x["id"]: x for x in LE.token_f1(df, "id", "pred", "gold").collect()}
    assert r[1]["f1"] == pytest.approx(1.0)
    assert r[2]["overlap"] == 1
    assert r[2]["precision"] == pytest.approx(1 / 3)
    assert r[2]["recall"] == pytest.approx(0.5)
    assert r[3]["f1"] == 0.0 and r[3]["n_pred"] == 0
    assert r[4]["f1"] == 0.0 and r[4]["overlap"] == 0


def test_stream_accuracy_rollup_equals_batch(spark, tmp_path):
    import os

    from azuredataengineering_deeplearning_spark.operators import lmeval as LE
    from azuredataengineering_deeplearning_spark.streaming import (
        read_accuracy_state, run_until_drained, stream_accuracy_rollup,
    )

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    in_schema = "lang string, pred string, gold string"
    g = '[{"Action":"Replace","ChimeraType":"DIMM"}]'
    rows1 = [("en", g, g), ("en", "bad json", g), ("de", g, g)]
    rows2 = [("en", g, g), ("de", '[{"Action":"Reboot","ChimeraType":"GPU"}]', g)]

    def drop(name, rows):
        import json as J
        with open(f"{landing}/{name}", "w") as f:
            for r in rows:
                f.write(J.dumps({"lang": r[0], "pred": r[1], "gold": r[2]}) + "\n")

    def start():
        return stream_accuracy_rollup(
            spark.readStream.schema(in_schema).json(landing),
            ["lang"], "pred", "gold", SCHEMA, state, ckpt,
        )

    drop("b1.jsonl", rows1)
    run_until_drained(start())
    drop("b2.jsonl", rows2)
    run_until_drained(start())

    got = {r["lang"]: (r["n"], r["valid_rate"], r["exact_match_rate"], r["mean_items"])
           for r in read_accuracy_state(spark, state).collect()}
    batch = spark.createDataFrame(rows1 + rows2, in_schema)
    want_df = LE.accuracy_summary(
        LE.structured_output_eval(batch, "pred", "gold", SCHEMA), ["lang"]
    )
    want = {r["lang"]: (r["n"], r["valid_rate"], r["exact_match_rate"], r["mean_items"])
            for r in want_df.collect()}
    assert got == want
