"""Set operations, sampling, dedup, splits (SURVEY §2.7 U1-U10).

Seeded randomness follows the reference's convention (explicit seeds,
``spark_data_generating.py:28-32``). Sampled/shuffled DataFrames are
recomputed nondeterministically under task retries — persist or
checkpoint before reusing a sample in two places (SURVEY §7 risk
register).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_all(dfs: Sequence[DataFrame], by_name: bool = True) -> DataFrame:
    """Fold many frames into one (U1; ``spark_data_generating.py:36-43``
    144M-row union). ``unionByName`` is position-safe; Spark unions are
    metadata-only — no shuffle."""
    fn = (lambda a, b: a.unionByName(b)) if by_name else DataFrame.unionAll
    return reduce(fn, dfs)


def union_by_name_missing(dfs: Sequence[DataFrame]) -> DataFrame:
    """U2: schema-reconciling union — missing columns become NULL
    (``scale_features.py:29-31``)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def sample_fraction(
    df: DataFrame, fraction: float, seed: int = 42, with_replacement: bool = False
) -> DataFrame:
    """U4: seeded Bernoulli/Poisson sampling (``spark_data_generating.py:28-32``)."""
    return df.sample(with_replacement, fraction, seed)


def mixture_sample(
    sources: Mapping[str, DataFrame],
    proportions: Mapping[str, float],
    target_rows: int,
    seed: int = 42,
) -> DataFrame:
    """U5: proportional mixture to a target size
    (``spark_data_generating.py:46-67``): per-source fraction =
    wanted/available, with replacement when a source is too small.
    Counts the sources once (cheap aggregate) — the only driver-side data.
    """
    parts = []
    for name, df in sources.items():
        want = proportions.get(name, 0.0) * target_rows
        if want <= 0:
            continue
        have = df.count()
        frac = want / max(have, 1)
        parts.append(df.sample(frac > 1.0, frac, seed))
    return union_all(parts)


def shuffle_rows(df: DataFrame, seed: int = 42) -> DataFrame:
    """U6: full deterministic shuffle (``template_dataset.py:127``
    ``sample(frac=1)``) — a seeded-random global sort."""
    return df.orderBy(F.rand(seed))


def rand_fold(df: DataFrame, n_folds: int = 10, seed: int = 42, out: str = "fold") -> DataFrame:
    """U7: random fold assignment 0..n (``…encoder_spark.py:110``)."""
    return df.withColumn(out, F.round(F.rand(seed) * n_folds).cast("int"))


def dedup_exact(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """U8: exact dedup. With ``keys``, keeps key-distinct rows of only the
    key columns (deterministic); whole-row dedup otherwise. For
    latest-wins semantics use :func:`operators.aggregates.argmax_rows`
    (the reference's sort + ``keep='last'``, ``generate_data.py:174``)."""
    return df.select(*keys).distinct() if keys else df.distinct()


def group_split(
    df: DataFrame,
    key: str,
    fractions: Sequence[float],
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """U9: group-aware split (``generate_data.py:433-477``
    GroupShuffleSplit): every row of a key lands in the same split —
    no leakage. Keys get a seeded uniform draw; cumulative fraction
    boundaries assign the split id. Distinct keys are a narrow aggregate;
    the assignment joins back on the key (broadcast when small)."""
    assert abs(sum(fractions) - 1.0) < 1e-9, "fractions must sum to 1"
    keys = df.select(key).distinct().withColumn("__u", F.rand(seed))
    boundary, case = 0.0, None
    for i, frac in enumerate(fractions[:-1]):
        boundary += frac
        cond = F.col("__u") < boundary
        case = F.when(cond, i) if case is None else case.when(cond, i)
    expr = (
        case.otherwise(len(fractions) - 1)
        if case is not None
        else F.lit(len(fractions) - 1)
    )
    assignment = keys.withColumn(out, expr.cast("int")).drop("__u")
    return df.join(assignment, [key], "left")


def validate_disjoint_splits(df: DataFrame, key: str, split: str = "split") -> None:
    """U9 leakage assert (``generate_data.py:471-473``): no key appears in
    two splits. O(keys) aggregate."""
    leaked = (
        df.groupBy(key)
        .agg(F.countDistinct(split).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert leaked == 0, f"{leaked} keys leak across splits"


def reverse_groups(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    value: str,
    pos: str = "pos",
    out: str = "value",
) -> DataFrame:
    """U10: per-group sequence inversion (``generate_data.py:24-42``
    augmentation): collect each group's ordered values, reverse, re-emit
    with a 0-based position. One shuffle; groups must fit in memory
    (bounded-session assumption, same as the reference)."""
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col(order_by).alias("o"), F.col(value).alias("v")))),
        lambda s: s.v,
    )
    g = df.groupBy(*keys).agg(F.reverse(ordered).alias("__rev"))
    return g.select(*keys, F.posexplode("__rev").alias(pos, out))


def _hash_bucket(key, buckets: int):
    """Portable deterministic bucket in [0, buckets): 60-bit md5 prefix
    mod buckets. Engine-agnostic (DuckDB: ``CAST('0x'||substr(md5(k),1,15)
    AS BIGINT) % buckets``) so samples reproduce across engines and
    re-runs — unlike seeded RNG, which is engine-private. Spark-only
    pipelines can swap in ``xxhash64`` for ~5× cheaper hashing."""
    h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10).cast("long")
    return h % buckets


def hash_sample(df: DataFrame, key: str, fraction: float, buckets: int = 10_000) -> DataFrame:
    """Deterministic content-keyed sampling: keep rows whose key hashes
    into the first ``fraction`` of ``buckets``. The reproducible
    alternative to :func:`sample_fraction` — same rows on every run, on
    every engine, under task retries (seeded ``df.sample`` re-draws when
    a task is recomputed). Map-only: no shuffle, survives any scale; the
    filter sits directly on the scan. Sampling is exact per-key, so a key
    appearing twice is kept or dropped atomically (dedup-friendly)."""
    return df.filter(_hash_bucket(key, buckets) < int(fraction * buckets))


def hash_fold(df: DataFrame, key: str, n_folds: int = 10, out: str = "fold") -> DataFrame:
    """Deterministic fold assignment: ``hash(key) % n_folds``. Unlike
    :func:`rand_fold`, rows with equal keys share a fold (group-safe CV)
    and the assignment is stable across runs/engines. Map-only."""
    return df.withColumn(out, _hash_bucket(key, n_folds).cast("int"))


def hash_group_split(
    df: DataFrame,
    key: str,
    fractions: Sequence[float],
    buckets: int = 10_000,
    out: str = "split",
) -> DataFrame:
    """Leakage-free deterministic split: every row of a key lands in the
    same split, chosen by the key's hash bucket against cumulative
    fraction boundaries. The reproducible sibling of :func:`group_split`
    — no distinct-keys aggregate, no join, no RNG: one map-side
    expression on the scan, so it costs the same at 100 TB as at 1 GB."""
    assert abs(sum(fractions) - 1.0) < 1e-9, "fractions must sum to 1"
    b = _hash_bucket(key, buckets)
    boundary, case = 0.0, None
    for i, frac in enumerate(fractions[:-1]):
        boundary += frac
        cond = b < int(boundary * buckets)
        case = F.when(cond, i) if case is None else case.when(cond, i)
    expr = case.otherwise(len(fractions) - 1) if case is not None else F.lit(0)
    return df.withColumn(out, expr.cast("int"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Per-stratum seeded sampling (``df.sampleBy``): each stratum value
    keeps its own fraction — the dataset-mixing primitive when rates are
    specified per language/source rather than per input table (compare
    ``mixture_sample``, which targets an output size). Strata absent
    from ``fractions`` are dropped, matching sampleBy semantics. A
    map-only plan: no shuffle at any scale."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def hash_topk_sample(df: DataFrame, key: str, k: int) -> DataFrame:
    """Exact-size deterministic sample: the k rows whose key hashes
    smallest. Unlike fraction sampling the output size is exactly
    ``min(k, n)``, and unlike seeded RNG it reproduces across engines
    and retries. Plans as TakeOrderedAndProject — per-partition top-k
    then a k-row merge on the driver side of the exchange; no global
    sort materializes. (This IS distributed reservoir sampling with a
    deterministic priority function.)"""
    pri = F.md5(F.col(key).cast("string")).alias("__pri")
    return df.withColumn("__pri", pri).orderBy("__pri").limit(k).drop("__pri")


def hash_weighted_sample(
    df: DataFrame, key: str, weight, buckets: int = 10_000
) -> DataFrame:
    """Per-row-probability deterministic sampling: keep a row iff its
    key's hash bucket falls under ``weight`` × buckets, where ``weight``
    is a per-row [0, 1] column/expression (e.g. a quality score, or a
    per-language rate joined on). The reproducible form of weighted
    Bernoulli sampling — same verdict per key on every engine and
    retry; still map-only."""
    w = F.col(weight) if isinstance(weight, str) else weight
    return df.filter(_hash_bucket(key, buckets) < (w * buckets).cast("long"))


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    key: str,
    target_rows: int,
    alpha: float = 0.5,
    buckets: int = 10_000,
) -> DataFrame:
    """Temperature-weighted multi-source sampling — the standard LLM
    data-mixing rule: source ``s`` with ``n_s`` rows gets sampling
    weight ``n_s^alpha / Σ n^alpha`` (``alpha < 1`` up-weights small
    sources, ``alpha = 1`` is proportional, ``alpha = 0`` uniform per
    source), scaled to ``target_rows`` total in expectation.

    Deterministic: the per-row keep decision is the portable md5 hash
    bucket (:func:`hash_sample`), so the draw reproduces across engines,
    runs, and task retries — a seeded ``sample()`` cannot promise any of
    that. Two jobs: an O(sources) count aggregate (broadcast back), then
    one map-only filter sitting directly on the scan."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    rows = counts.collect()  # O(distinct sources) — a mixture has few
    total_w = sum(r["__n"] ** alpha for r in rows)
    rates = {
        r[source_col]: min(1.0, target_rows * (r["__n"] ** alpha) / total_w / r["__n"])
        for r in rows
    }
    rate_col = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(rate))
            for s, rate in rates.items()
        ],
        F.lit(0.0),
    )
    return df.filter(
        _hash_bucket(key, buckets) < (rate_col * buckets).cast("long")
    )


def stratified_fixed_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    out_rank: str | None = None,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by PORTABLE HASH RANK: rows ordered by the
    60-bit md5 of their key within each stratum, first n win. Unlike
    ``sampleBy`` this is (a) exact-count, (b) engine-reproducible —
    the same rows are drawn by DuckDB, a re-run, or a retried task —
    and (c) stable under data growth: a row's rank only changes if
    rows hashing lower join its stratum. One window shuffle on the
    stratum key. The eval-set construction primitive."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    ranked = df.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= n_per_stratum
    )
    if out_rank:
        return ranked.withColumnRenamed("__r", out_rank)
    return ranked.drop("__r")
