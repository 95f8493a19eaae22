"""Round-13 scalar batch 7 edge cases: property-bag surgery on the
JSON-string bag form, jaccard_index conventions, hash combinators,
strcmp/strrep/isascii/isutf8, and the documented re-embed subset pins
(the bag form is untyped JSON text, so a string value that spells a
number re-embeds as a number — pinned, not hidden)."""

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


def _one(spark, expr):
    df = spark.createDataFrame([(1,)], "id int")
    return kql_to_df(
        {"T": df}, f"T | extend r = {expr} | project r"
    ).collect()[0]["r"]


def test_bag_keys(spark):
    assert _one(spark, "bag_keys(pack('a', 1, 'b', 'x'))") == ["a", "b"]
    # non-bag / null input -> null
    assert _one(spark, "bag_keys('[1,2]')") is None
    assert _one(spark, "bag_keys(tostring(''))") is None


def test_bag_merge_leftmost_wins(spark):
    assert _one(
        spark, "bag_merge(pack('a', 1, 'n', 2), pack('n', 9, 'z', 'q'))"
    ) == '{"a":1,"n":2,"z":"q"}'
    # 3-way, first appearance pins key order
    assert _one(
        spark, "bag_merge(pack('a', 1), pack('b', 2), pack('a', 7, 'c', 3))"
    ) == '{"a":1,"b":2,"c":3}'
    # nested bag and array values pass through verbatim
    assert _one(
        spark, "bag_merge(pack('o', pack('x', 1)), pack('b', pack_array(1, 2)))"
    ) == '{"o":{"x":1},"b":[1,2]}'
    # null bag -> null result
    assert _one(spark, "bag_merge(tostring(''), pack('a', 1))") is None


def test_bag_remove_keys(spark):
    assert _one(
        spark,
        "bag_remove_keys(pack('a', 1, 'b', 2, 'c', 'x'),"
        " pack_array('b', 'zz'))",
    ) == '{"a":1,"c":"x"}'
    # removing everything leaves the empty bag
    assert _one(
        spark, "bag_remove_keys(pack('a', 1), pack_array('a'))"
    ) == "{}"


def test_bag_set_key(spark):
    # existing key updates IN PLACE; new key appends
    assert _one(
        spark, "bag_set_key(pack('a', 1, 'b', 2), 'b', 'new')"
    ) == '{"a":1,"b":"new"}'
    assert _one(
        spark, "bag_set_key(pack('a', 1), 'z', 3.5)"
    ) == '{"a":1,"z":3.5}'
    # typed embeds: array value, empty string, null value
    assert _one(
        spark, "bag_set_key(pack('a', 1), 'z', pack_array(1, 2))"
    ) == '{"a":1,"z":[1,2]}'
    assert _one(
        spark, "bag_set_key(pack('a', 1), 'e', '')"
    ) == '{"a":1,"e":""}'


def test_bag_value_escaping_round_trip(spark):
    # a value with quotes and backslashes survives re-embedding
    got = _one(
        spark, r"""bag_merge(pack('k', 'say "hi" \\ bye'), pack('j', 1))"""
    )
    assert got == '{"k":"say \\"hi\\" \\\\ bye","j":1}'


def test_bag_reembed_subset_pin(spark):
    # DOCUMENTED SUBSET: the bag form is untyped JSON text, so a
    # string value that spells a number re-embeds as a number
    assert _one(
        spark, "bag_merge(pack('k', '123'), pack('j', 1))"
    ) == '{"k":123,"j":1}'


def test_jaccard_index(spark):
    assert _one(
        spark, "jaccard_index(pack_array(1, 2, 3), pack_array(2, 3, 4))"
    ) == pytest.approx(0.5)
    # duplicates collapse (set semantics)
    assert _one(
        spark, "jaccard_index(pack_array(1, 1, 2), pack_array(2, 2, 1))"
    ) == pytest.approx(1.0)
    # empty/empty -> 1.0 by convention; disjoint -> 0.0
    assert _one(
        spark,
        "jaccard_index(array_split(pack_array(1), 0)[0],"
        " array_split(pack_array(2), 0)[0])",
    ) == pytest.approx(1.0)
    assert _one(
        spark, "jaccard_index(pack_array('a'), pack_array('b'))"
    ) == pytest.approx(0.0)


def test_hash_combinators(spark):
    assert _one(spark, "hash_many('a', 1) == hash_many('a', 1)") is True
    assert _one(spark, "hash_many('a', 1) != hash_many('a', 2)") is True
    assert _one(
        spark, "hash_combine(hash('a'), hash('b'))"
        " == hash_combine(hash('a'), hash('b'))"
    ) is True


def test_strcmp(spark):
    assert _one(spark, "strcmp('a', 'b')") == -1
    assert _one(spark, "strcmp('b', 'a')") == 1
    assert _one(spark, "strcmp('', '')") == 0
    assert _one(spark, "strcmp('abc', tostring(''))") == 1


def test_strrep(spark):
    assert _one(spark, "strrep('ab', 3)") == "ababab"
    assert _one(spark, "strrep('x', 3, '-')") == "x-x-x"
    assert _one(spark, "strrep('x', 1)") == "x"
    # multiplier < 1 -> '' (pinned lenient; Kusto errors)
    assert _one(spark, "strrep('x', 0)") == ""
    assert _one(spark, "strrep('x', -2, '.')") == ""


def test_isascii_isutf8(spark):
    assert _one(spark, "isascii('hello w0rld!')") is True
    assert _one(spark, "isascii('héllo')") is False
    assert _one(spark, "isascii('')") is True
    assert _one(spark, "isutf8('any spark string')") is True
    assert _one(spark, "isutf8('')") is True


def test_double_quoted_literal_form(spark):
    # Kusto's second literal form: double quotes carry single quotes
    # (the raw single-quote dialect has no escape for ')
    assert _one(spark, 'strcat("O\'Brien", \'-\', "x")') == "O'Brien-x"
    assert _one(spark, 'strlen("a|b,c")') == 5  # inert in splitters
    got = _one(spark, """bag_merge(pack('k', "it's"), pack('j', 1))""")
    assert got == '{"k":"it\'s","j":1}'
