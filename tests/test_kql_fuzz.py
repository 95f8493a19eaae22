"""Seeded grammar fuzzer for the KQL rewriter (verdict r9 item #3).

pkg/sources/kql.py is ~1.6k lines of regex-driven rewriting with
string-literal masking; its failure class is SILENT MISPARSE on
nesting/precedence — exactly what hand review caught twice (has_any
matching identifier text, mv-apply snapshot leak). This fuzzer
generates >=200 random pipes from the supported grammar, with quoted
literals deliberately containing pipes, parens, keywords, LIKE
wildcards and operator text, and asserts EQUIVALENCE against a
DataFrame twin built stage-by-stage with native ops. A silently
dropped or mangled stage shows up as a row/value mismatch; there is no
"close enough".

A second pass feeds malformed constructs and asserts a LOUD error
(never a silent pass-through).
"""

import random
import re

import pytest
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.sources.kql import kql_to_df

# literals chosen to collide with the rewriter's own syntax: pipe
# separators, parens, keywords, comparison text, LIKE wildcards,
# dots (regex metachar), commas
LITS = [
    "a|b", "w(here", "and or", "sum(v)", "100%", "x_y",
    "take 5", "a.b", "== 3", "by k", "alpha", "BETA,c",
]
TERMS = ["alpha", "BETA", "a.b", "100%", "x1"]  # for has (term search)


def _mkdata(spark):
    rows = []
    for i in range(24):
        k = ["alpha", "beta", "gamma"][i % 3]
        s = f"{LITS[i % len(LITS)]} {TERMS[i % len(TERMS)]} tail{i}"
        rows.append((k, s, i + 0.5, i % 7))
    return spark.createDataFrame(rows, "k string, s string, v double, n int")


# ---- stage generators: (kql_text, twin_fn, post_summarize_ok) -------
# each returns (kql stage string, fn(df) -> df applying the same
# semantics natively). Twins use ONLY native column ops, never the
# rewriter, so agreement is evidence of a correct parse.


def _g_where(rng, cols):
    kind = rng.choice(
        ["cmp", "contains", "has", "between", "eq", "compound",
         "has_all", "notbetween"]
    )
    if kind == "has_all" and "s" in cols:
        t1, t2 = rng.sample(TERMS, 2)
        p1 = "(?i)\\b" + re.escape(t1) + "\\b"
        p2 = "(?i)\\b" + re.escape(t2) + "\\b"
        return (
            f"where s has_all ('{t1}', '{t2}')",
            lambda df: df.filter(
                F.col("s").rlike(p1) & F.col("s").rlike(p2)
            ),
        )
    if kind == "notbetween" and "n" in cols:
        a, b = sorted(rng.sample(range(7), 2))
        return (
            f"where n !between ({a} .. {b})",
            lambda df: df.filter(~((F.col("n") >= a) & (F.col("n") <= b))),
        )
    if kind == "compound" and "v" in cols and "s" in cols:
        # boolean nesting + a literal that LOOKS like more predicate
        t = rng.choice([6.0, 11.0])
        lit = rng.choice(LITS)
        return (
            f"where (v > {t} and s contains '{lit}') or k == 'gamma'",
            lambda df: df.filter(
                (
                    (F.col("v") > t)
                    & F.lower(F.col("s")).contains(lit.lower())
                )
                | (F.col("k") == "gamma")
            ),
        )
    if kind == "cmp" and "v" in cols:
        t = rng.choice([5.0, 10.0, 15.0])
        return f"where v > {t}", lambda df: df.filter(F.col("v") > t)
    if kind == "between" and "n" in cols:
        a, b = sorted(rng.sample(range(7), 2))
        return (
            f"where n between ({a} .. {b})",
            lambda df: df.filter((F.col("n") >= a) & (F.col("n") <= b)),
        )
    if kind == "contains" and "s" in cols:
        lit = rng.choice(LITS)
        return (
            f"where s contains '{lit}'",
            lambda df: df.filter(
                F.lower(F.col("s")).contains(lit.lower())
            ),
        )
    if kind == "has" and "s" in cols:
        term = rng.choice(TERMS)
        pat = "(?i)\\b" + re.escape(term) + "\\b"
        return f"where s has '{term}'", lambda df: df.filter(
            F.col("s").rlike(pat)
        )
    key = rng.choice(["alpha", "beta", "gamma"])
    return f"where k == '{key}'", lambda df: df.filter(F.col("k") == key)


def _g_extend(rng, cols, i):
    name = f"e{i}"
    kind = rng.choice(["arith", "strcat", "iff"])
    if kind == "arith" and "v" in cols:
        return (
            f"extend {name} = v * 2 + 1",
            lambda df: df.withColumn(name, F.col("v") * 2 + 1),
            name,
        )
    if kind == "strcat":
        lit = rng.choice(LITS)
        return (
            f"extend {name} = strcat(k, '{lit}')",
            lambda df: df.withColumn(name, F.concat(F.col("k"), F.lit(lit))),
            name,
        )
    a, b = rng.sample(LITS, 2)
    t = rng.choice([5.0, 12.0])
    col = "v" if "v" in cols else "sv"
    if rng.random() < 0.5:
        # nested call: strcat INSIDE iff, comma-bearing literals inside
        # parens — the precedence shape the rewriter must not fracture
        return (
            f"extend {name} = iff({col} > {t}, strcat(k, '{a}'), '{b}')",
            lambda df: df.withColumn(
                name,
                F.when(
                    F.col(col) > t, F.concat(F.col("k"), F.lit(a))
                ).otherwise(F.lit(b)),
            ),
            name,
        )
    return (
        f"extend {name} = iff({col} > {t}, '{a}', '{b}')",
        lambda df: df.withColumn(
            name, F.when(F.col(col) > t, F.lit(a)).otherwise(F.lit(b))
        ),
        name,
    )


def _g_sorttake(rng, order_col):
    nn = rng.randint(2, 8)
    d = rng.choice(["asc", "desc"])
    col = F.col(order_col).asc() if d == "asc" else F.col(order_col).desc()
    return (
        f"sort by {order_col} {d} | take {nn}",
        lambda df: df.orderBy(col).limit(nn),
    )


def _g_top(rng, order_col):
    nn = rng.randint(2, 8)
    d = rng.choice(["", " asc", " desc"])  # bare = Kusto desc default
    def twin(df):
        c = F.col(order_col).asc() if d == " asc" else F.col(order_col).desc()
        return df.orderBy(c).limit(nn)
    return f"top {nn} by {order_col}{d}", twin


def _canon(df):
    rows = []
    for r in df.collect():
        rows.append(
            tuple(
                round(x, 6) if isinstance(x, float) else x
                for x in r
            )
        )
    return sorted(map(repr, rows)), sorted(df.columns)


def _g_extend_chained(rng, prev_name, i):
    # extend referencing a PREVIOUS extend's column — composition the
    # rewriter must not fracture
    name = f"e{i}"
    return (
        f"extend {name} = strlen({prev_name})",
        lambda df: df.withColumn(name, F.length(F.col(prev_name))),
        name,
    )


def _one_case(rng, spark, base):
    stages, twins = [], []
    cols = {"k", "s", "v", "n"}
    n_mid = rng.randint(1, 5)
    last_str_extend = None
    for i in range(n_mid):
        pick = rng.random()
        if pick < 0.45:
            t, fn = _g_where(rng, cols)
            stages.append(t)
            twins.append(fn)
        elif pick < 0.75:
            if last_str_extend and rng.random() < 0.35:
                t, fn, name = _g_extend_chained(rng, last_str_extend, i)
                last_str_extend = None
            else:
                t, fn, name = _g_extend(rng, cols, i)
                if "strcat" in t or "iff" in t:
                    last_str_extend = name
            stages.append(t)
            twins.append(fn)
            cols.add(name)
        elif pick < 0.9:
            t, fn = _g_sorttake(rng, "v")
            stages.append(t)
            twins.append(fn)
        else:
            t, fn = _g_top(rng, "v")
            stages.append(t)
            twins.append(fn)
    if rng.random() < 0.5:
        stages.append("summarize c = count(), sv = sum(v) by k")
        twins.append(
            lambda df: df.groupBy("k").agg(
                F.count(F.lit(1)).alias("c"), F.sum("v").alias("sv")
            )
        )
        cols = {"k", "c", "sv"}
        if rng.random() < 0.4:
            # post-summarize WHERE on an aggregate column (HAVING shape)
            t = rng.choice([1, 2, 3])
            stages.append(f"where c >= {t}")
            twins.append(lambda df, t=t: df.filter(F.col("c") >= t))
        if rng.random() < 0.5:
            t, fn = _g_top(rng, "sv")
            stages.append(t)
            twins.append(fn)
    # terminal stage: project (usual), or one of the r9 whole-table
    # operators (facet / search) exercised against hand-built twins
    roll = rng.random()
    if roll < 0.12 and {"k"} <= cols and len(cols) > 1:
        other = rng.choice(sorted(cols - {"k"}))
        stages.append(f"facet by k, {other}")

        def _facet_twin(df, other=other):
            a = df.groupBy("k").agg(F.count(F.lit(1)).alias("count_")).select(
                F.lit("k").alias("facet_column"),
                F.col("k").cast("string").alias("facet_value"),
                "count_",
            )
            b = df.groupBy(other).agg(
                F.count(F.lit(1)).alias("count_")
            ).select(
                F.lit(other).alias("facet_column"),
                F.col(other).cast("string").alias("facet_value"),
                "count_",
            )
            return a.unionByName(b)

        twins.append(_facet_twin)
    elif roll < 0.22 and "s" in cols:
        term = rng.choice(TERMS)
        pat = "(?i)\\b" + re.escape(term) + "\\b"
        stages.append(f"search '{term}'")

        def _search_twin(df, pat=pat):
            scols = [c for c, t in df.dtypes if t == "string"]
            cond = F.col(scols[0]).rlike(pat)
            for c in scols[1:]:
                cond = cond | F.col(c).rlike(pat)
            return df.filter(cond)

        twins.append(_search_twin)
    else:
        keep = sorted(rng.sample(sorted(cols), rng.randint(1, len(cols))))
        stages.append("project " + ", ".join(keep))
        twins.append(lambda df, keep=keep: df.select(*keep))

    q = "T | " + " | ".join(stages)
    got = kql_to_df({"T": base}, q)
    want = base
    for fn in twins:
        want = fn(want)
    g, w = _canon(got), _canon(want)
    assert g == w, f"MISMATCH for {q!r}:\n got {g}\nwant {w}"


def test_fuzz_200_random_pipes_match_dataframe_twin(spark):
    base = _mkdata(spark).cache()
    base.count()
    rng = random.Random(20260815)
    for case in range(200):
        _one_case(rng, spark, base)
    base.unpersist()


MALFORMED = [
    "T | frobnicate by k",                      # unknown operator
    "T | top by v",                             # missing N
    "T | top 3 v",                              # missing by
    "T | where s has_any (k)",                  # bare identifier arg
    "T | facet by nope",                        # unknown facet column
    "T | join hint.remote=left (T) on k",       # unsupported hint
    "T | partition by nope (top 1 by v)",       # unknown partition col
    "T | summarize frob(v) by k",               # unknown aggregate
    "T | mv-apply s on (frobnicate)",           # bad sub-stage
    "T | top-nested 2 of k by median(v)",       # unsupported tn agg
]


@pytest.mark.parametrize("q", MALFORMED)
def test_fuzz_malformed_raises_loudly(spark, q):
    base = _mkdata(spark)
    with pytest.raises(Exception) as ei:
        kql_to_df({"T": base}, q).collect()
    # loud and typed: the translator's own ValueError, or Spark's
    # analysis error — never a silent pass-through
    assert ei.type is not None
