"""SCD2 dimension maintenance (SURVEY §2.3 J5/J6, §2.5 W1/W3).

``apply_scd2`` reproduces the reference's windowed SCD2 dating
(``DataEngineering/DataBricks/apply_scd2.py:14-47``): int yyyyMMdd
effective/expiration dates, ``20991231`` open-end sentinel, and a
``currentVersion`` flag. One deliberate deviation: the reference flags
``currentVersion=1`` wherever ``effectiveDate`` equals the per-key max,
so ties yield *two* current rows; we use a deterministic latest-row
row_number so exactly one row per key is current (ties broken by the
optional ``tiebreak`` columns, descending).

The changeset-merge engine (J5) lives in ``operators/merge.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from azuredataengineering_deeplearning_spark.functions.dates import (
    DATE_KEY_OPEN_END,
    date_key,
)


def apply_scd2(
    df: DataFrame,
    natural_key: Sequence[str],
    change_ts: str,
    tiebreak: Sequence[str] = (),
    effective_col: str = "effectiveDate",
    expiration_col: str = "expirationDate",
    current_col: str = "currentVersion",
    open_end: int = DATE_KEY_OPEN_END,
) -> DataFrame:
    """Add SCD2 housekeeping columns to a change history.

    Each row becomes a version: effective from its own change date,
    expiring the day before the next version's change date (int yyyyMMdd
    keys), with the latest version carrying ``open_end`` and
    ``currentVersion=1`` (``apply_scd2.py:30-44`` semantics).
    """
    order = [F.col(change_ts)] + [F.col(t) for t in tiebreak]
    w = Window.partitionBy(*natural_key).orderBy(*order)
    w_desc = Window.partitionBy(*natural_key).orderBy(*[c.desc() for c in order])

    next_change = F.lead(change_ts).over(w)
    return (
        df.withColumn(effective_col, date_key(change_ts))
        .withColumn(
            expiration_col,
            F.coalesce(date_key(F.date_sub(next_change, 1)), F.lit(open_end)),
        )
        .withColumn(
            current_col,
            F.when(F.row_number().over(w_desc) == 1, 1).otherwise(0).cast("tinyint"),
        )
    )


def with_surrogate_key(
    df: DataFrame,
    order_by: Sequence[str],
    out: str = "surrogateKey",
    start: int = 1,
) -> DataFrame:
    """Deterministic dense surrogate keys 1..N by a total order — the
    Silver identity column (``AIO_delta_table_generator.py:79``) without
    Delta's GENERATED ALWAYS AS IDENTITY.

    Scale-safe: a naive global ``row_number`` would serialize every row
    through one task. Instead: range-partition on the order, number
    within partitions, then add per-partition row-count offsets (a tiny
    broadcast) — the zipWithIndex pattern in pure DataFrame form.

    Delegates to ``windows._global_row_number_total`` — the
    deterministic-bounds bucketing kernel (bucket id is a pure function
    of the leading order value, so recomputation is always consistent:
    no ``spark_partition_id`` pinning, no persist, no checkpoint,
    ordinary lineage fault tolerance). Two cheap O(buckets)-result jobs
    run at call time (bounds sample + per-bucket counts); the numbering
    itself is LAZY and runs at the caller's action. Persist the input
    upstream if it is expensive to recompute across those scans.

    DETERMINISM PRECONDITION: the input plan must be deterministic —
    the eager count jobs and the lazy numbering evaluate it separately,
    so a plan containing ``rand()``/``sample``/un-ordered ``limit`` can
    disagree between the two scans, producing wrong offsets or
    duplicate keys. ``localCheckpoint(eager=True)`` such inputs first
    to pin one materialization."""
    from azuredataengineering_deeplearning_spark.operators.windows import (
        _global_row_number_total,
    )

    numbered, _ = _global_row_number_total(df, list(order_by), out, None)
    if start != 1:
        numbered = numbered.withColumn(
            out, (F.col(out) + F.lit(start - 1)).cast("long")
        )
    return numbered


def validate_scd2(
    df: DataFrame,
    natural_key: Sequence[str],
    current_col: str = "currentVersion",
    expiration_col: str = "expirationDate",
    open_end: int = DATE_KEY_OPEN_END,
) -> None:
    """Engine-level invariant checks (SURVEY §5.2): exactly one current
    row per key, and only current rows carry the open-end sentinel.
    Raises AssertionError; O(keys) result collected, never row data."""
    bad_current = (
        df.groupBy(*natural_key)
        .agg(F.sum(current_col).alias("n_current"))
        .filter(F.col("n_current") != 1)
        .count()
    )
    assert bad_current == 0, f"{bad_current} keys without exactly one current row"
    mismatched = df.filter(
        (F.col(current_col) == 1) != (F.col(expiration_col) == open_end)
    ).count()
    assert mismatched == 0, f"{mismatched} rows where open-end and current flag disagree"


def scd2_as_of(
    dim: DataFrame,
    as_of_date_key: int,
    effective_col: str = "effectiveDate",
    expiration_col: str = "expirationDate",
) -> DataFrame:
    """Temporal point-in-time read of an SCD2 dimension: the version of
    every key that was in force on ``as_of_date_key`` (int yyyyMMdd).
    Bounds are inclusive (``expirationDate`` is the day before the next
    version). Pure filter — with the dimension partitioned or clustered
    on the effective range, file skipping prunes history at scan time."""
    return dim.filter(
        (F.col(effective_col) <= as_of_date_key)
        & (F.col(expiration_col) >= as_of_date_key)
    )


def scd2_temporal_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    fact_date_key: str,
    effective_col: str = "effectiveDate",
    expiration_col: str = "expirationDate",
    how: str = "left",
    prefix: str = "dim_",
) -> DataFrame:
    """Attach to every fact row the dimension version in force at the
    fact's date — THE SCD2 fact-dim join (int yyyyMMdd keys, inclusive
    bounds). Non-key dim columns arrive ``prefix``ed.

    Plan shape: Catalyst executes the natural-key equality as the join
    condition and the date-range as a post-join filter, so this stays a
    hash/sort-merge equi-join — never a range nested-loop. Fan-out
    before the filter is bounded by versions-per-key (small by SCD2
    construction); broadcast the dim when it fits."""
    ren = {k: f"__k_{i}" for i, k in enumerate(keys)}
    d = dim.select(
        *[F.col(k).alias(v) for k, v in ren.items()],
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in dim.columns
            if c not in keys
        ],
    )
    cond = None
    for k, v in ren.items():
        c = facts[k] == d[v]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (F.col(fact_date_key) >= d[f"{prefix}{effective_col}"])
        & (F.col(fact_date_key) <= d[f"{prefix}{expiration_col}"])
    )
    return facts.join(d, cond, how).drop(*ren.values())


def compact_scd2(
    dim: DataFrame,
    natural_key: Sequence[str],
    compare_cols: Sequence[str],
    effective_col: str = "effectiveDate",
    expiration_col: str = "expirationDate",
    current_col: str = "currentVersion",
) -> DataFrame:
    """History hygiene: collapse ADJACENT versions whose compared
    attributes are identical into one effective span (reprocessing and
    no-op updates leave such stutter versions behind; they bloat the
    dimension and slow every temporal join).

    One key-partitioned window pass: flag rows whose attributes differ
    (null-safely) from the previous version, running-sum the flags into
    span ids, then aggregate each span to [min effective, max
    expiration]. Non-adjacent repeats of the same attributes stay
    separate versions — SCD2 semantics require it.

    The window orders by (effective, expiration): versions sharing an
    effectiveDate within a key (same-day updates) would otherwise make
    the lag/span assignment nondeterministic across engines."""
    order = [F.col(effective_col), F.col(expiration_col)]
    w = Window.partitionBy(*natural_key).orderBy(*order)
    prev = [F.lag(c).over(w) for c in compare_cols]
    changed = F.lit(False)
    for c, p in zip(compare_cols, prev):
        changed = changed | ~F.col(c).eqNullSafe(p)
    first = F.row_number().over(w) == 1
    span = F.sum(
        F.when(first | changed, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    flagged = dim.withColumn("__span", span)
    aggs = [
        F.min(effective_col).alias(effective_col),
        F.max(expiration_col).alias(expiration_col),
        F.max(current_col).alias(current_col),
        *[F.first(c).alias(c) for c in compare_cols],
    ]
    return flagged.groupBy(*natural_key, "__span").agg(*aggs).drop("__span")
