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

from pyspark.sql import DataFrame
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
    rf = RandomForestClassifier(
        featuresCol="features",
        labelCol=f"{label_col}_si",
        weightCol="weight" if weighted else None,
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
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
