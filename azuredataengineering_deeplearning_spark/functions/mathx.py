"""Math / misc expression helpers (SURVEY §2.8 F18, F21-F22)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def salt_bucket(col: Column | str, salt_size: int) -> Column:
    """F18: floor-division salt (``salt_cumsum.py:4`` ``floor(ts/salt)``) —
    the bucket id the salted-window operators partition on."""
    return F.floor(_c(col) / F.lit(salt_size)).cast("long")


def log1p_target(col: Column | str) -> Column:
    """F18: log1p transform of a target (``stats_forecast_predict.py:440-443``)."""
    return F.log1p(_c(col))


def expm1_inverse(col: Column | str) -> Column:
    """F18: inverse of :func:`log1p_target`."""
    return F.expm1(_c(col))


def abs_error(a: Column | str, b: Column | str) -> Column:
    """F21: per-row absolute error, vectorized
    (``stats_forecast_predict.py:446`` row-apply MAE → expression)."""
    return F.abs(_c(a) - _c(b))


def null_mask(col: Column | str) -> Column:
    """F22: attention-mask-style null indicator, tinyint 0/1
    (``discover_schema.py:16-17``)."""
    return F.when(_c(col).isNull(), F.lit(0)).otherwise(F.lit(1)).cast("byte")


def with_null_masks(df: DataFrame, columns: list[str], suffix: str = "_attnmask") -> DataFrame:
    """F22 applied across columns in one projection
    (``discover_schema.py:59-67`` single-select idiom)."""
    return df.withColumns({f"{c}{suffix}": null_mask(c) for c in columns})


def factorize(df: DataFrame, column: str, out: str) -> DataFrame:
    """F18: dense integer codes for a categorical — ``pd.factorize``
    analog (``azureml_ray_basic_functions.py:70``) coded 0..N-1 by
    sorted value order (deterministic, unlike first-appearance order
    which is partition-dependent at scale). NULL categories code to
    ``-1``, matching ``pd.factorize``'s sentinel. Two cheap
    O(buckets)-result jobs run at call time (the surrogate-key bounds/
    counts scans); the coding itself is lazy.

    The rank over the distinct-value frame goes through
    :func:`~azuredataengineering_deeplearning_spark.operators.scd.with_surrogate_key`
    (deterministic-bounds buckets + literal offsets, the fit_ordinal fix) —
    never an unpartitioned ``dense_rank``, because a near-unique
    key-like column makes distinct ≈ rows and a global window would
    serialize the frame through one task. The code attach keeps the
    broadcast hint (dictionary-sized mapping, same contract as
    ``apply_ordinal``); for a genuinely near-unique column drop the
    hint and let AQE pick the join side."""
    from azuredataengineering_deeplearning_spark.operators.scd import with_surrogate_key

    distinct = df.select(column).distinct().filter(F.col(column).isNotNull())
    codes = with_surrogate_key(distinct, [column], out=out, start=0)
    codes = codes.withColumn(out, F.col(out).cast("int"))
    return df.join(F.broadcast(codes), [column], "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(-1))
    )
