"""Declarative data-quality constraints (Deequ-style, Spark-first).

The reference validates loads imperatively (row counts after merges,
``discover_schema.py`` type probing, ad-hoc notebook asserts); this
module makes the checks declarative and SINGLE-PASS: every constraint
compiles to an aggregate expression, the whole suite runs as ONE
map-side-combined aggregation over the table, and the result unpivots
to one row per constraint — (name, metric, passed). At 100 TB a
20-constraint suite costs exactly one scan; nothing is collected except
the O(constraints) report.

Referential integrity is the one constraint that needs a second input;
it stays a left-anti aggregate against the dimension (AQE broadcasts
small dims at runtime) and unions into the same report shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.sources.readers import local_rows_df


@dataclass(frozen=True)
class Check:
    """One constraint: ``kind`` ∈ {not_null, unique, in_range, in_set,
    matches_regex, min_rows} with its parameters. ``min_frac`` is the
    fraction of rows that must satisfy the predicate (1.0 = all)."""

    name: str
    kind: str
    column: str | None = None
    min_frac: float = 1.0
    lo: float | None = None
    hi: float | None = None
    values: tuple = field(default_factory=tuple)
    pattern: str | None = None
    threshold: int | None = None


def _metric_expr(c: Check, total: Column) -> Column:
    col = F.col(c.column) if c.column else None
    if c.kind == "not_null":
        ok = F.sum(F.when(col.isNotNull(), 1).otherwise(0))
        return ok / total
    if c.kind == "unique":
        # distinct/total == 1.0 iff no duplicates (nulls count as one
        # distinct value, matching DuckDB COUNT(DISTINCT) + null check)
        return (
            F.countDistinct(col)
            + F.max(F.when(col.isNull(), 1).otherwise(0))
        ) / total
    if c.kind == "in_range":
        ok = F.sum(
            F.when(col.isNotNull() & col.between(c.lo, c.hi), 1).otherwise(0)
        )
        return ok / total
    if c.kind == "in_set":
        arr = F.array(*[F.lit(v) for v in c.values])
        ok = F.sum(F.when(F.array_contains(arr, col), 1).otherwise(0))
        return ok / total
    if c.kind == "matches_regex":
        ok = F.sum(F.when(col.rlike(c.pattern), 1).otherwise(0))
        return ok / total
    if c.kind == "min_rows":
        return total.cast("double")
    raise ValueError(f"unknown check kind: {c.kind}")


def _passed_expr(c: Check) -> Column:
    m = F.col("metric")
    if c.kind == "min_rows":
        return m >= float(c.threshold or 0)
    return m >= c.min_frac


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Run the suite in ONE aggregation pass → (name, metric, passed),
    row order = suite order via an explicit rank column. ``metric`` is
    the satisfied fraction (or the row count for min_rows)."""
    total = F.count(F.lit(1))
    agg = df.agg(
        *[
            _metric_expr(c, total).cast("double").alias(f"__m_{i}")
            for i, c in enumerate(checks)
        ]
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("rank"),
                        F.lit(c.name).alias("name"),
                        F.col(f"__m_{i}").alias("metric"),
                    )
                    for i, c in enumerate(checks)
                ]
            )
        ).alias("r")
    ).select("r.*")
    passed = None
    for i, c in enumerate(checks):
        cond = _passed_expr(c)
        passed = (
            F.when(F.col("rank") == i, cond)
            if passed is None
            else passed.when(F.col("rank") == i, cond)
        )
    return stacked.withColumn("passed", passed)


def check_referential_integrity(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    name: str = "ref_integrity",
) -> DataFrame:
    """Orphan-key check → the same (rank, name, metric, passed) report
    shape: metric = fraction of fact rows whose key exists in the
    dimension (nulls count as orphans). One anti-join aggregate; AQE
    broadcasts the dim when it is small."""
    total = fact.count()
    orphans = (
        fact.select(F.col(fact_col).alias("__k"))
        .join(
            dim.select(F.col(dim_col).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
        .count()
    )
    spark = fact.sparkSession
    metric = (total - orphans) / total if total else 1.0
    return local_rows_df(
        spark,
        [(0, name, float(metric), orphans == 0)],
        "rank int, name string, metric double, passed boolean",
    )


def benford_profile(
    df: DataFrame,
    column: str,
) -> DataFrame:
    """Benford's-law first-digit screen — the classic anomaly/fraud
    check for naturally-occurring positive amounts: observed leading-
    digit frequencies vs the Benford expectation ``log10(1 + 1/d)``,
    plus each digit's chi-square contribution. A large total chi-square
    (vs ~15.5 at α=0.05, 8 dof) flags fabricated or truncated data.

    One aggregation pass over positive finite values; the leading digit
    is pure arithmetic — ``floor(v / 10^floor(log10(v)))`` — identical
    on any engine. Returns 9 rows: (digit, n, frac, expected_frac,
    chi2_term)."""
    import math

    v = F.col(column).cast("double")
    pos = df.filter(v.isNotNull() & (v > 0))
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    counts = pos.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    spark = df.sparkSession
    exp = local_rows_df(
        spark,
        [(d, math.log10(1 + 1 / d)) for d in range(1, 10)],
        "digit int, expected_frac double",
    )
    tot = F.broadcast(counts.agg(F.sum("n").alias("__t")))
    joined = (
        exp.join(counts, "digit", "left")
        .crossJoin(tot)
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            (F.coalesce("n", F.lit(0)) / F.col("__t")).alias("frac"),
            "expected_frac",
            F.col("__t"),
        )
    )
    chi = (
        (F.col("n") - F.col("expected_frac") * F.col("__t"))
        * (F.col("n") - F.col("expected_frac") * F.col("__t"))
        / (F.col("expected_frac") * F.col("__t"))
    )
    return joined.select(
        "digit", "n", "frac", "expected_frac", chi.alias("chi2_term")
    )


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict:
    """Write + audit in ONE pass: attach ``df.observe`` aggregate
    metrics to the plan, run the write action, return the collected
    metric values. At 100 TB the alternative — write, then re-scan to
    compute row counts / null rates / sums for the audit table — doubles
    the job; ``observe`` rides the write's own scan (Spark accumulates
    the aggregates task-side during the action, exactly-once per row
    for foreground actions like this write).

    ``metrics`` maps output names to AGGREGATE expressions, e.g.
    ``{"n": F.count(F.lit(1)), "null_keys": F.sum(F.col("k").isNull()
    .cast("int"))}``. Returns ``{name: value}``."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).format(fmt).save(path)
    return dict(obs.get)
