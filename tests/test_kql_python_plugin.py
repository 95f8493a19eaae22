"""Round-13 ``evaluate python(...)`` — Kusto's python plugin as ONE
Arrow-batched mapInPandas pass. Pins the Kusto contract (df/kargs in,
`result` out, typeof output schema), the triple-backtick masking
(python ``//`` floor division and ``|`` operators must survive comment
stripping and pipe splitting), loud failures, and chunking semantics."""

import pytest

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df


@pytest.fixture()
def tdf(spark):
    return spark.createDataFrame(
        [(i, float(i) * 1.5, "ab"[i % 2]) for i in range(20)],
        "k int, v double, g string",
    )


def test_rowwise_extend_with_kargs(spark, tdf):
    out = kql_to_df(
        {"T": tdf},
        """
        T
        | evaluate python(typeof(*, y:real), ```
        result = df
        result['y'] = result['v'] * kargs['m'] + kargs['b']
        ```, dynamic({"m": 2.0, "b": 1.0}))
        | project k, y
        """,
    ).collect()
    got = {r["k"]: r["y"] for r in out}
    assert got == {i: i * 1.5 * 2.0 + 1.0 for i in range(20)}


def test_pipe_and_floordiv_inside_code_survive(spark, tdf):
    # '|' (bitwise or) and '//' (floor division) are python syntax the
    # KQL layer must NOT treat as pipe separator / comment
    out = kql_to_df(
        {"T": tdf},
        """
        T
        | evaluate python(typeof(*, z:long), ```
        result = df
        result['z'] = (result['k'] // 3) | 8
        ```)
        | summarize n = count() by z
        | sort by z asc
        """,
    ).collect()
    assert [r["z"] for r in out] == [8, 9, 10, 11, 12, 13, 14]


def test_full_schema_replacement_aggregating_script(spark, tdf):
    # aggregating scripts see the PARTITION chunk — pin to 1 partition
    # for determinism (the documented Kusto-parity dial)
    one = tdf.coalesce(1)
    out = kql_to_df(
        {"T": one},
        """
        T
        | evaluate python(typeof(g:string, total:real), ```
        result = df.groupby('g', as_index=False)['v'].sum()
        result = result.rename(columns={'v': 'total'})
        ```)
        | sort by g asc
        """,
    ).collect()
    assert [(r["g"], r["total"]) for r in out] == [
        ("a", sum(i * 1.5 for i in range(0, 20, 2))),
        ("b", sum(i * 1.5 for i in range(1, 20, 2))),
    ]


def test_quoted_literal_script_form(spark, tdf):
    out = kql_to_df(
        {"T": tdf},
        "T | evaluate python(typeof(*, w:long),"
        " 'result = df\\nresult[\\'w\\'] = result[\\'k\\'] + 100')"
        " | summarize mx = max(w)",
    ).collect()
    assert out[0]["mx"] == 119


def test_schema_star_is_input_schema(spark, tdf):
    out = kql_to_df(
        {"T": tdf},
        "T | evaluate python(typeof(*), 'result = df[df[\\'k\\'] < 5]')",
    )
    assert out.columns == ["k", "v", "g"]
    assert out.count() == 5


def test_loud_failures(spark, tdf):
    with pytest.raises(ValueError, match="typeof"):
        kql_to_df({"T": tdf}, "T | evaluate python('x', 'result = df')")
    with pytest.raises(ValueError, match="bad typeof item"):
        kql_to_df(
            {"T": tdf},
            "T | evaluate python(typeof(a:frobnicate), 'result = df')",
        )
    with pytest.raises(ValueError, match="duplicate output column"):
        kql_to_df(
            {"T": tdf},
            "T | evaluate python(typeof(*, k:long), 'result = df')",
        )
    with pytest.raises(Exception, match="assign the output|result"):
        kql_to_df(
            {"T": tdf},
            "T | evaluate python(typeof(*), 'x = 1')",
        ).collect()
    with pytest.raises(Exception, match="missing output columns"):
        kql_to_df(
            {"T": tdf},
            "T | evaluate python(typeof(*, absent:real), 'result = df')",
        ).collect()


def test_comment_stripping_still_on_outside_code(spark, tdf):
    out = kql_to_df(
        {"T": tdf},
        """
        T // a KQL comment
        | evaluate python(typeof(*, y:long), ```
        result = df
        result['y'] = result['k'] * 2  # a PYTHON comment
        ```)  // trailing KQL comment
        | summarize s = max(y)
        """,
    ).collect()
    assert out[0]["s"] == 38


def test_distribution_hint_accepted_and_dropped(spark, tdf):
    out = kql_to_df(
        {"T": tdf},
        "T | evaluate hint.distribution = per_node python(typeof(*, y:long),"
        " 'result = df\\nresult[\\'y\\'] = result[\\'k\\'] * 3')"
        " | summarize s = max(y)",
    ).collect()
    assert out[0]["s"] == 57
