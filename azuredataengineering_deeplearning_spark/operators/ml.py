"""Distributed tree-ensemble training — the engine face of the
reference's RandomForest job (``spark_randomforest.py:17-70``).

The reference's chain: assemble the numeric ``INPUT*`` columns into a
vector, string-index the label, attach inverse-frequency class weights
(computed with a driver-side ``collect`` over the label histogram),
fit ``RandomForestClassifier`` with AQE pinned off and 5000 shuffle
partitions, score a held-out frame. Here the same chain is expressed
scale-first:

- class weights come from a BROADCAST join of the O(classes) label
  histogram — no driver collect, no Python dict literal in the plan;
- feature assembly skips rows with nulls explicitly (``handleInvalid``
  is a parameter, not a surprise);
- the fitted model is a plain MLlib model: ``predict`` scores any
  frame map-side (the model broadcasts with the task closure).

MLlib's RandomForest trains distributed (per-tree bootstrap on
partitioned data), so the fit itself scales with the cluster — the
engine only owns the data-prep contract around it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def class_weight_column(
    df: DataFrame,
    label_col: str,
    out: str = "weight",
) -> DataFrame:
    """Inverse-frequency class weights: ``total / (n_classes * count_c)``
    per row (sklearn's "balanced" convention, the formula of
    ``spark_randomforest.py:31-38``) — computed as one O(classes)
    aggregate broadcast back onto the frame, never a driver collect."""
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__cnt"))
    totals = counts.agg(
        F.sum("__cnt").alias("__tot"), F.count(F.lit(1)).alias("__k")
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        label_col,
        (F.col("__tot") / (F.col("__k") * F.col("__cnt"))).alias(out),
    )
    return df.join(F.broadcast(weights), label_col)


def assemble_features(
    df: DataFrame,
    feature_cols: Sequence[str],
    out: str = "features",
    handle_invalid: str = "skip",
) -> DataFrame:
    """Numeric columns → MLlib vector column (the reference's
    ``VectorAssembler`` over ``INPUT*`` fields,
    ``spark_randomforest.py:17-23``)."""
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(
        inputCols=list(feature_cols), outputCol=out, handleInvalid=handle_invalid
    )
    return va.transform(df)


def index_label(
    df: DataFrame, label_col: str, out: str | None = None
):
    """String label → dense double index (StringIndexer, frequency
    order — ``spark_randomforest.py:26-29``). Returns (DataFrame,
    fitted indexer) so inference frames reuse the same mapping."""
    from pyspark.ml.feature import StringIndexer

    out = out or f"{label_col}_si"
    si = StringIndexer(
        inputCols=[label_col], outputCols=[out], handleInvalid="keep"
    ).fit(df)
    return si.transform(df), si


def fit_random_forest(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    weighted: bool = True,
    num_trees: int = 50,
    max_depth: int = 8,
    seed: int = 42,
):
    """The full reference chain (assemble → index → weight → fit) as one
    call. Returns (model, fitted label indexer)."""
    from pyspark.ml.classification import RandomForestClassifier

    indexed, si = index_label(train, label_col)
    if weighted:
        indexed = class_weight_column(indexed, f"{label_col}_si")
    data = assemble_features(indexed, feature_cols)
    # weightCol must be OMITTED, not None: pyspark forwards an explicit
    # None to the JVM param and fit() dies with NullPointerException.
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol=f"{label_col}_si",
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
        **({"weightCol": "weight"} if weighted else {}),
    )
    return rf.fit(data), si


def predict(model, si, df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    """Score a frame map-side: assemble the same features, apply the
    broadcast model, translate the predicted index back to the label
    string. Adds ``prediction`` (string) and ``probability``."""
    from pyspark.ml.feature import IndexToString

    data = assemble_features(df, feature_cols)
    scored = model.transform(data)
    back = IndexToString(
        inputCol="prediction",
        outputCol="predicted_label",
        labels=si.labelsArray[0],
    )
    return back.transform(scored)


def feature_importances(model, feature_cols: Sequence[str]):
    """Impurity-based feature importances as (feature, importance) rows
    — the Spark-native answer to the reference's post-hoc model
    explanation step (``shap_demo_xgb.py``; MLlib exposes normalized
    Gini importances on the fitted ensemble, no re-scan of the data).
    Returns a list of (name, float) sorted descending."""
    imps = model.featureImportances
    pairs = [(name, float(imps[i])) for i, name in enumerate(feature_cols)]
    return sorted(pairs, key=lambda p: (-p[1], p[0]))


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Confusion counts as one grouped aggregate (``label, prediction,
    n``) — the evaluation table the reference's eval jobs build after
    scoring (``llama2/eval.py`` / ``daily_eval.py:118-183`` accuracy
    tallies). Long format so the class count never widens the schema."""
    return df.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("prediction")
    ).agg(F.count(F.lit(1)).alias("n"))


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision / recall / F1 + support from ONE pass over
    the scored frame: the (label, prediction) contingency aggregates
    once, then per-class totals come from two O(classes) re-aggregations
    of that tiny frame (never a rescan of the data). Macro/micro
    averages are one more O(classes) reduction on the result."""
    cm = confusion_matrix(df, label_col, pred_col).cache()
    tp = (
        cm.filter(F.col("label") == F.col("prediction"))
        .select(F.col("label").alias("cls"), F.col("n").alias("tp"))
    )
    actual = cm.groupBy(F.col("label").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    predicted = cm.groupBy(F.col("prediction").alias("cls")).agg(
        F.sum("n").alias("n_pred")
    )
    rep = (
        actual.join(predicted, "cls", "full_outer")
        .join(tp, "cls", "left")
        .na.fill({"tp": 0, "support": 0, "n_pred": 0})
    )
    precision = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("support") > 0, F.col("tp") / F.col("support")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return rep.select(
        "cls",
        F.col("support").cast("long").alias("support"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def _ordered_running_sums(
    counts: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    ascending: bool = True,
    raw: tuple[DataFrame, "F.Column", dict[str, "F.Column"]] | None = None,
    n_buckets: int | None = None,
) -> tuple[DataFrame, dict[str, float]]:
    """Running (inclusive) sums of ``value_cols`` along the total order
    of ``order_col`` WITHOUT a single-task global window. Matters
    because callers feed per-distinct-score frames, and for continuous
    model scores distinct cardinality ≈ row count — a plain
    ``Window.orderBy`` would serialize 100 TB of scores through one
    task. Assumes ``order_col`` values are distinct (true for the
    post-groupBy frames the eval suite builds).

    Shape — DETERMINISTIC-BOUNDS bucketing (replaces the r5
    ``repartitionByRange`` + pinned ``spark_partition_id`` kernel,
    whose persist/localCheckpoint lifecycle cost two full-frame
    materializations and made the result lineage-free):

    1. bucket boundaries from an approx-quantile sketch (one cheap
       scan); the bucket id ``#bounds < value`` is a PURE FUNCTION OF
       THE DATA VALUE, so any recomputation reproduces it — no pinning,
       no persist, no checkpoint, ordinary fault tolerance;
    2. per-bucket totals in a second O(buckets)-group scan, collected
       driver-side; exclusive prefix sums → offsets;
    3. the returned frame is LAZY: within-bucket running windows
       (``Window.partitionBy(__b)``, parallel) plus the offset attached
       by an O(buckets) literal-array lookup — no join, one shuffle.

    ``raw=(df, order_expr, {value_col: sum_expr})`` lets callers point
    steps 1-2 at the RAW pre-aggregation frame: the quantile sketch and
    the O(buckets) totals agg are then plain scans with map-side
    combine, never re-running the caller's distinct-score aggregate
    (the expensive part). Without ``raw`` both jobs evaluate ``counts``.

    Eager CONTRACT NOTE: the two bound/total jobs run at call time
    (freezing their view of the input); the cum frame itself stays
    lazy. Returns ``(frame with __cum_<col> per value column, grand
    totals {col: sum})`` — totals fall out of the offset pass, so
    callers never re-aggregate for them."""
    from functools import reduce

    spark = counts.sparkSession
    n = n_buckets or spark.sparkContext.defaultParallelism
    probs = [i / n for i in range(1, n)]
    if raw is not None:
        rdf, oexpr, vexprs = raw
        # bounds only steer bucket BALANCE, never correctness — a 5%
        # sample keeps the sketch scan cheap at any scale
        bounds = (
            rdf.select(oexpr.alias("__oq"))
            .sample(fraction=0.05, seed=7)
            .approxQuantile("__oq", probs, 0.02)
        )
    else:
        bounds = counts.approxQuantile(order_col, probs, 0.01)
    bounds = sorted({float(b) for b in bounds if b is not None})

    def bucket_of(c):
        # nulls compare to null -> otherwise(0): bucket 0, matching
        # NULLS FIRST (asc) / NULLS LAST (desc, bucket 0 walks last)
        return reduce(
            lambda a, b: a + F.when(c > F.lit(b), 1).otherwise(0),
            bounds,
            F.lit(0),
        )

    if raw is not None:
        per = (
            rdf.groupBy(bucket_of(oexpr).alias("__b"))
            .agg(*[F.sum(e).alias(c) for c, e in vexprs.items()])
            .collect()
        )
    else:
        per = (
            counts.groupBy(bucket_of(F.col(order_col)).alias("__b"))
            .agg(*[F.sum(c).alias(c) for c in value_cols])
            .collect()
        )
    n_b = len(bounds) + 1
    totals_by_b = {int(r["__b"]): r for r in per}
    acc = {c: 0.0 for c in value_cols}
    off_arrays = {c: [0.0] * n_b for c in value_cols}
    walk = range(n_b) if ascending else reversed(range(n_b))
    for b in walk:
        for c in value_cols:
            off_arrays[c][b] = acc[c]
        r = totals_by_b.get(b)
        if r is not None:
            for c in value_cols:
                acc[c] += float(r[c] or 0.0)

    ob = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    wc = counts.withColumn("__b", bucket_of(F.col(order_col)))
    w_in = (
        Window.partitionBy("__b")
        .orderBy(ob)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = wc
    for c in value_cols:
        arr = F.array(*[F.lit(v) for v in off_arrays[c]])
        out = out.withColumn(
            f"__cum_{c}",
            F.sum(c).over(w_in) + F.element_at(arr, F.col("__b") + 1),
        )
    return out.drop("__b"), acc


def binary_auc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney with tie correction) computed
    scale-first: the frame first REDUCES to per-distinct-score
    positive/negative counts (one hash aggregate — at 100 TB this is
    the only pass over the data), then the running-negative window runs
    over that O(distinct scores) frame only. Never a per-row global
    sort. ``AUC = Σ_s pos_s · (neg_below(s) + neg_s/2) / (P·N)`` —
    identical to averaged-rank AUC for any tie structure.
    ``label_col`` must be 0/1.

    The running-negative cumulative over the distinct-score frame is
    distributed via :func:`_ordered_running_sums` (deterministic
    quantile-bounds buckets + literal-array offsets) — for continuous
    model scores distinct cardinality ≈ row count, so an unpartitioned
    window here would be a single-task bottleneck at scale. The
    bounds/totals jobs run against the RAW frame (cheap O(buckets)
    aggregates), so the distinct-score hash aggregate runs exactly once,
    at the caller's action. Eager bounds/totals jobs at call time; the
    result frame is lazy and fault-tolerant."""
    y = F.col(label_col).cast("double")
    counts = df.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(y).alias("__pos"),
        F.sum(1.0 - y).alias("__neg"),
    )
    cum, _ = _ordered_running_sums(
        counts, "__s", ["__neg"], ascending=True,
        raw=(df, F.col(score_col), {"__neg": 1.0 - y}),
    )
    # negatives strictly below this score = inclusive running sum − own
    contrib = cum.select(
        "__pos",
        "__neg",
        (
            F.col("__pos")
            * (F.col("__cum___neg") - F.col("__neg") + F.col("__neg") / 2.0)
        ).alias("__c"),
    )
    agg = contrib.agg(
        F.sum("__pos").alias("__p"),
        F.sum("__neg").alias("__n"),
        F.sum("__c").alias("__cc"),
    )
    p, n = F.col("__p"), F.col("__n")
    # explicit single-class guard: ANSI mode (Spark 4 default) turns the
    # 0-denominator into an error, not a null
    return agg.select(
        p.cast("long").alias("n_pos"),
        n.cast("long").alias("n_neg"),
        F.when((p > 0) & (n > 0), F.col("__cc") / (p * n)).alias("auc"),
    )


def regression_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """MAE / RMSE / R² / sMAPE in one aggregate (the forecast-eval
    readout of ``daily_eval.py`` / the darts tuners' scoring step).
    R² uses the standard 1 − SSE/SST form; SST accumulates via the
    sum-of-squares identity so a single pass suffices."""
    y = F.col(label_col).cast("double")
    yhat = F.col(pred_col).cast("double")
    err = yhat - y
    sden = F.abs(y) + F.abs(yhat)
    sterm = F.when(sden > 0, 2.0 * F.abs(err) / sden).otherwise(F.lit(0.0))
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg(err * err).alias("__mse"),
        F.avg(sterm).alias("smape"),
        F.sum(y).alias("__sy"),
        F.sum(y * y).alias("__syy"),
    )
    sst = F.col("__syy") - F.col("__sy") * F.col("__sy") / F.col("__n")
    r2 = F.when(
        sst > 0, 1.0 - (F.col("__mse") * F.col("__n")) / sst
    )
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        "mae",
        F.sqrt(F.col("__mse")).alias("rmse"),
        r2.alias("r2"),
        "smape",
    )


def calibration_bins(
    df: DataFrame, label_col: str, score_col: str, bins: int = 10
) -> DataFrame:
    """Reliability-diagram table: scores bucketed into ``bins`` equal
    [0,1) intervals, each with mean predicted score, observed positive
    rate, and count — plus each bin's Brier contribution. One hash
    aggregate; plotting-ready O(bins) output."""
    y = F.col(label_col).cast("double")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * bins).cast("int"), F.lit(bins - 1)
    ).alias("bin")
    return (
        df.select(b, s.alias("__s"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s").alias("mean_score"),
            F.avg("__y").alias("pos_rate"),
            F.sum((F.col("__s") - F.col("__y")) ** 2).alias("brier_sum"),
        )
    )


def threshold_sweep(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """Precision / recall / F1 at EVERY distinct score threshold
    ("predict positive when score >= s") — the full PR curve from the
    same scale-first reduction as :func:`binary_auc`: one hash
    aggregate to per-score counts, then cumulative sums over the
    O(distinct scores) frame — distributed via
    :func:`_ordered_running_sums` (descending order), never an
    unpartitioned window, because distinct scores ≈ rows for continuous
    models. Total positives fall out of the same per-partition offset
    collect the running sums already do (one aggregation of the raw
    data, total) and enter the plan as a literal. ``argmax f1`` over
    the result picks the operating point; no repeated scans per
    candidate threshold. Eager: the offset jobs run at call time (see
    :func:`_ordered_running_sums`), freezing input state at the call,
    not at the caller's first action."""
    y = F.col(label_col).cast("double")
    counts = df.groupBy(F.col(score_col).cast("double").alias("threshold")).agg(
        F.sum(y).alias("__pos"),
        F.sum(1.0 - y).alias("__neg"),
    )
    cum, totals = _ordered_running_sums(
        counts, "threshold", ["__pos", "__neg"], ascending=False,
        raw=(
            df,
            F.col(score_col).cast("double"),
            {"__pos": y, "__neg": 1.0 - y},
        ),
    )
    tp = F.col("__cum___pos")
    fp = F.col("__cum___neg")
    p_tot = F.lit(totals["__pos"])
    precision = tp / (tp + fp)  # tp+fp >= 1 at every threshold row
    recall = F.when(p_tot > 0, tp / p_tot).otherwise(F.lit(0.0))
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    return cum.select(
        "threshold",
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
    )


def fit_gradient_boosting(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    num_iterations: int = 50,
    max_depth: int = 5,
    step_size: float = 0.1,
    seed: int = 42,
):
    """Gradient-boosted trees on the same prep chain as
    :func:`fit_random_forest` — the Spark-native face of the
    reference's XGBoost-on-Ray tabular job
    (``tabular/boost.py`` / ``minimal_xgboost_ray.py``: distributed
    boosting over partitioned data with a tune loop around it; MLlib's
    ``GBTClassifier`` trains each boosting stage distributed, and the
    scored output feeds the same :func:`classification_report` /
    :func:`binary_auc` readouts the reference computes with sklearn).
    Binary labels only (MLlib GBT restriction). Returns
    (model, fitted label indexer)."""
    from pyspark.ml.classification import GBTClassifier

    indexed, si = index_label(train, label_col)
    data = assemble_features(indexed, feature_cols)
    gbt = GBTClassifier(
        featuresCol="features",
        labelCol=f"{label_col}_si",
        maxIter=num_iterations,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
    )
    return gbt.fit(data), si


def kendall_tau_b(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact Kendall tau-b rank correlation between two columns per
    group — the reference's ranking-quality metric
    (``ray_train_pointwise.py:233-266`` computes the concordant /
    discordant sign matrix per slate in torch; here the same triangle
    runs as vectorized numpy per group behind one
    :func:`~azuredataengineering_deeplearning_spark.operators.timeseries.grouped_apply_packed`
    shuffle — per-group dispatch amortized per partition, fan-out
    pinned against AQE byte-coalescing).
    ``τ_b = (C − D) / sqrt((n₀ − T_x)(n₀ − T_y))`` with
    ``n₀ = n(n−1)/2`` and per-column tie corrections. O(n²) per group,
    parallel across groups — the slate/panel regime; swap in a
    merge-sort inversion count for very long groups."""
    import numpy as np
    import pandas as pd

    kk = list(keys)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*kk).schema.fields
    )
    schema = key_schema + ", n bigint, concordant bigint, discordant bigint, tau_b double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].astype(float).to_numpy()
        y = pdf[y_col].astype(float).to_numpy()
        n = len(x)
        sx = np.sign(x[None, :] - x[:, None])
        sy = np.sign(y[None, :] - y[:, None])
        prod = np.triu(sx * sy, k=1)
        c = int((prod > 0).sum())
        d = int((prod < 0).sum())
        half = n * (n - 1) / 2.0
        _, cx = np.unique(x, return_counts=True)
        _, cy = np.unique(y, return_counts=True)
        tx = float((cx * (cx - 1) / 2).sum())
        ty = float((cy * (cy - 1) / 2).sum())
        denom = np.sqrt((half - tx) * (half - ty))
        tau = (c - d) / denom if denom > 0 else 0.0
        out = pdf[kk].iloc[:1].copy()
        out["n"], out["concordant"], out["discordant"] = n, c, d
        out["tau_b"] = float(tau)
        return out

    from azuredataengineering_deeplearning_spark.operators.timeseries import (
        grouped_apply_packed,
    )

    return grouped_apply_packed(df.select(*kk, x_col, y_col), kk, fn, schema)


def build_ranking_slates(
    df: DataFrame,
    group_col: str,
    order_col: str,
    feature_col: str,
    max_len: int = 50,
) -> DataFrame:
    """Grouped-sequence dataset prep for rankers — the Spark side of the
    reference's pointwise/slate trainer (``ray_train_pointwise.py:
    179-226`` builds per-``group_key`` ordered feature tensors and takes
    the label at the final timestep). One grouped ``collect_list`` of
    (order, value) structs, array-sorted executor-side, truncated to the
    LAST ``max_len`` steps — per-group state is O(max_len) after the
    slice, and the shuffle carries only the projected columns.

    Returns ``group_col + seq (array<double>, time-ordered) + seq_len
    (pre-truncation length) + last (the final value — the pointwise
    label)``."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"),
                                F.col(feature_col).cast("double").alias("v")))
    )
    g = df.groupBy(group_col).agg(arr.alias("__a"))
    n = F.size("__a")
    tail = F.when(
        n > max_len, F.slice("__a", n - max_len + 1, max_len)
    ).otherwise(F.col("__a"))
    return g.select(
        group_col,
        F.transform(tail, lambda x: x["v"]).alias("seq"),
        n.cast("int").alias("seq_len"),
        F.element_at(F.col("__a"), -1)["v"].alias("last"),
    )


def negative_sample_interactions(
    df: DataFrame,
    user_col: str,
    item_col: str,
    id_cols: Sequence[str],
    n_items_df: DataFrame,
    k: int = 4,
) -> DataFrame:
    """Pointwise training pairs with deterministic hash negatives — the
    recsys dataset-construction step (the reference trains its pointwise
    ranker on labeled interaction pairs, ``ray_train_pointwise.py``;
    the classic prep draws k random non-interacted items per positive).
    Seeded RNG is engine-private and non-reproducible across retries, so
    negatives here come from the engine's portable md5-bucket hash over
    (user, interaction ids, draw index): same candidates on every
    engine, every run. Candidates that collide with a TRUE interaction
    are removed by one anti-join against the distinct positive set.

    ``n_items_df`` is a 1-row frame with column ``P`` (the item-id
    upper bound, items assumed 1..P) — pass an aggregate, it broadcasts.
    Returns ``user + item + label`` (1 = observed, 0 = sampled negative;
    up to k negatives per positive). Map-side generation + one
    broadcast + one anti-join shuffle."""
    u, it = F.col(user_col), F.col(item_col)
    pos = df.select(u.alias("user_key"), it.alias("item_key"), *id_cols)
    cand = (
        pos.crossJoin(F.broadcast(n_items_df))
        .select(
            "user_key",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("__j"),
            *id_cols,
            "P",
        )
        .select(
            "user_key",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "-",
                                F.col("user_key"),
                                *[F.col(c) for c in id_cols],
                                F.col("__j"),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("P")
                + 1
            ).alias("item_key"),
        )
    )
    observed = pos.select("user_key", "item_key").distinct()
    neg = cand.join(observed, ["user_key", "item_key"], "left_anti")
    return pos.select(
        "user_key", "item_key", F.lit(1).alias("label")
    ).unionByName(
        neg.select("user_key", "item_key", F.lit(0).alias("label"))
    )


def classification_summary(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """One-row macro/micro summary over :func:`classification_report`:
    accuracy (= micro-F1 for single-label), macro precision/recall/F1
    (unweighted class mean), and support-weighted F1. O(classes)
    reduction on the report frame."""
    rep = classification_report(df, label_col, pred_col)
    return rep.agg(
        F.sum("support").cast("long").alias("n"),
        (
            F.sum(F.col("recall") * F.col("support")) / F.sum("support")
        ).alias("accuracy"),
        F.avg("precision").alias("macro_precision"),
        F.avg("recall").alias("macro_recall"),
        F.avg("f1").alias("macro_f1"),
        (
            F.sum(F.col("f1") * F.col("support")) / F.sum("support")
        ).alias("weighted_f1"),
    )


def ndcg_at_k(
    df: DataFrame,
    keys: Sequence[str],
    score_col: str,
    rel_col: str,
    tie_col: str,
    k: int = 10,
) -> DataFrame:
    """NDCG@k per group — the graded-relevance ranking readout
    completing the recsys eval set (Kendall tau for concordance, NDCG
    for position-discounted gain). Two windows over the same group sort
    + one aggregate: DCG ranks by (score desc, ``tie_col``), the ideal
    DCG ranks the same rows by (relevance desc, ``tie_col``), and both
    discount by log2(rank+1) over the top ``k``. The explicit
    deterministic tiebreak makes ranks — and therefore the metric —
    identical across engines and retries, which a bare float sort does
    not guarantee. Returns ``keys + dcg + idcg + ndcg``."""
    from pyspark.sql import Window

    rel = F.col(rel_col).cast("double")
    w_pred = Window.partitionBy(*keys).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    w_ideal = Window.partitionBy(*keys).orderBy(
        rel.desc(), F.col(tie_col).asc()
    )
    ranked = df.select(
        *keys,
        rel.alias("__rel"),
        F.row_number().over(w_pred).alias("__rp"),
        F.row_number().over(w_ideal).alias("__ri"),
    )
    disc = lambda r: F.log2(r.cast("double") + 1.0)  # noqa: E731
    agg = ranked.groupBy(*keys).agg(
        F.sum(
            F.when(F.col("__rp") <= k, F.col("__rel") / disc(F.col("__rp")))
        ).alias("dcg"),
        F.sum(
            F.when(F.col("__ri") <= k, F.col("__rel") / disc(F.col("__ri")))
        ).alias("idcg"),
    )
    return agg.select(
        *keys,
        "dcg",
        "idcg",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )


def fit_pca(
    df: DataFrame,
    feature_cols: Sequence[str],
    k: int,
    max_sample: int = 100_000,
):
    """Driver-fit PCA on a bounded DETERMINISTIC sample (ordered by a
    row hash like the clustering fit — reproducible across retries,
    unlike ``sample()``). Returns ``(mean, components)`` as plain numpy
    (column means and the top-``k`` right singular vectors). The fit is
    O(max_sample · d²) on the driver; the data never leaves the
    cluster beyond the capped sample."""
    import numpy as np

    cols = [F.col(c).cast("double") for c in feature_cols]
    sample = (
        df.select(*[c.alias(f"__f{i}") for i, c in enumerate(cols)])
        .na.drop()
        .withColumn("__h", F.xxhash64(*[f"__f{i}" for i in range(len(cols))]))
        .orderBy("__h")
        .limit(max_sample)
        .drop("__h")
        .toPandas()
        .to_numpy(dtype=float)
    )
    mean = sample.mean(axis=0)
    centered = sample - mean
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return mean, vt[:k]


def pca_anomaly_scores(
    df: DataFrame,
    feature_cols: Sequence[str],
    mean,
    components,
    out: str = "recon_err",
) -> DataFrame:
    """Reconstruction-error anomaly score — the closed-form analog of
    the reference's autoencoder detector (``TransformerAutoEncoder.py``
    flags rows whose reconstruction through a low-rank bottleneck is
    poor; PCA is the linear bottleneck). The projection and
    reconstruction unroll into PURE COLUMN ARITHMETIC (the fitted mean
    and components are literals), so scoring is whole-stage-codegen
    map work — no UDF, no Arrow, scan-speed at any scale. Adds
    ``out`` = squared reconstruction error."""
    xs = [F.col(c).cast("double") - float(m) for c, m in zip(feature_cols, mean)]
    # z_i = <x - mean, w_i>
    zs = [
        sum((x * float(w)) for x, w in zip(xs, comp_row))
        for comp_row in components
    ]
    # recon_j = sum_i z_i w_ij ; err = sum_j (x_j - recon_j)^2
    err = None
    for j, x in enumerate(xs):
        recon_j = sum(z * float(comp_row[j]) for z, comp_row in zip(zs, components))
        d = x - recon_j
        err = d * d if err is None else err + d * d
    return df.withColumn(out, err)
