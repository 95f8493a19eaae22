"""Round-13 bag-surgery fuzzer — generated flat bags driven through
bag_merge / bag_set_key / bag_remove_keys / bag_keys with a FOREIGN
twin: plain python dicts + the json module replaying the documented
semantics (leftmost-wins merge, first-appearance key order, in-place
set, top-level remove, untyped re-embed subset). Values cover ints,
bools, strings with quotes/backslashes/specials, and the pinned
ambiguity (a string spelling a number re-embeds as a number).

The engine builds bags via pack() from literal columns; the twin
computes the expected JSON text independently and the comparison is
SEMANTIC (json.loads) + KEY-ORDER (raw scan), so a formatting
difference that preserves meaning still fails only if it changes
keys/values/order."""

import json
import random
import re

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

pytestmark = pytest.mark.slow  # heavy differential/fuzz suite: deselected by default (pytest.ini), run with -m ""


_KEYS = ["alpha", "k2", "zz", "name", "v_1", "B"]
_STRINGS = [
    "plain", "with space", 'say "hi"', "back\\slash", "x'y",
    "true-ish", "[not an array", "{not a bag", "trailing ",
]
_NUM_STRINGS = ["123", "-4.5", "1e3", "true", "false"]  # subset pins


def _kql_lit(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    esc = str(v).replace("\\", "\\\\")
    if "'" in esc:
        # Kusto's other literal form: double quotes carry a single
        # quote without escaping games (r13 dialect addition)
        return f'"{esc}"'
    return f"'{esc}'"


def _embed(v):
    """The engine's documented re-embed classification for a value
    that round-trips through the untyped JSON-text bag form."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    s = str(v)
    if s in ("true", "false"):
        return s == "true"
    if re.fullmatch(r"-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?", s):
        return json.loads(s)
    if s[:1] in ("{", "["):
        # pass-through only if the text actually parses (the r13
        # bag-fuzzer find: '{not a bag' must stay a quoted string)
        try:
            return json.loads(s)
        except ValueError:
            return s
    return s


def _gen_bag(rng):
    keys = rng.sample(_KEYS, rng.randint(1, 4))
    vals = []
    for _ in keys:
        kind = rng.randrange(4)
        if kind == 0:
            vals.append(rng.randint(-999, 999))
        elif kind == 1:
            vals.append(rng.random() < 0.5)
        elif kind == 2:
            vals.append(rng.choice(_STRINGS))
        else:
            vals.append(rng.choice(_NUM_STRINGS))
    return list(zip(keys, vals))


def _pack(items):
    return "pack(" + ", ".join(
        f"'{k}', {_kql_lit(v)}" for k, v in items) + ")"


def _key_order(raw):
    """Top-level key order from the raw JSON text (json.loads loses
    duplicate/order info only for dicts — python preserves insertion
    order, but scan raw to be independent of that)."""
    return list(json.loads(
        raw, object_pairs_hook=lambda ps: [k for k, _ in ps]))


def test_fuzz_bag_surgery_vs_python_dicts(spark):
    rng = random.Random(1308)
    df = spark.createDataFrame([(1,)], "id int")
    for ci in range(30):
        b1, b2 = _gen_bag(rng), _gen_bag(rng)
        setk = rng.choice(_KEYS)
        setv = rng.choice([rng.randint(0, 99), rng.choice(_STRINGS)])
        rmks = rng.sample(_KEYS, rng.randint(1, 3))
        q = (
            f"T | extend m = bag_merge({_pack(b1)}, {_pack(b2)})"
            f" | extend s = bag_set_key(m, '{setk}', {_kql_lit(setv)}),"
            f" r = bag_remove_keys(m, pack_array("
            + ", ".join(f"'{k}'" for k in rmks) + ")),"
            " ks = strcat_array(bag_keys(m), '\\n')"
            " | project m, s, r, ks"
        )
        row = kql_to_df({"T": df}, q).collect()[0]

        # foreign twin: python dicts, leftmost wins, insertion order
        merged = {}
        for k, v in b1 + b2:
            if k not in merged:
                merged[k] = _embed(v)
        set_d = dict(merged)
        set_d[setk] = setv if isinstance(setv, int) else setv
        rm_d = {k: v for k, v in merged.items() if k not in rmks}

        got_m = json.loads(row["m"])
        assert got_m == merged, (ci, b1, b2, row["m"], merged)
        assert _key_order(row["m"]) == list(merged), (ci, row["m"])
        got_s = json.loads(row["s"])
        # bag_set_key embeds the SQL-typed value exactly (no re-embed
        # ambiguity for the new value); existing keys keep position
        want_s = {k: (set_d[k] if k != setk else setv)
                  for k in merged}
        if setk not in merged:
            want_s[setk] = setv
        assert got_s == want_s, (ci, row["s"], want_s)
        assert _key_order(row["s"]) == list(want_s), (ci, row["s"])
        got_r = json.loads(row["r"])
        assert got_r == rm_d, (ci, row["r"], rm_d)
        assert _key_order(row["r"]) == list(rm_d), (ci, row["r"])
        assert row["ks"].split("\n") == list(merged), (ci, row["ks"])


def test_fuzz_jaccard_vs_python_sets(spark):
    rng = random.Random(1309)
    df = spark.createDataFrame([(1,)], "id int")
    for ci in range(15):
        a = [rng.randint(0, 12) for _ in range(rng.randint(1, 8))]
        b = [rng.randint(0, 12) for _ in range(rng.randint(1, 8))]
        q = (
            "T | extend j = jaccard_index("
            f"pack_array({', '.join(map(str, a))}),"
            f" pack_array({', '.join(map(str, b))})) | project j"
        )
        got = kql_to_df({"T": df}, q).collect()[0]["j"]
        sa, sb = set(a), set(b)
        want = len(sa & sb) / len(sa | sb)
        assert got == pytest.approx(want, abs=1e-12), (ci, a, b)
