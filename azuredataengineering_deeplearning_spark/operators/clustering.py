"""D11 — driver-fit clustering with distributed approximate predict.

The reference fits UMAP+HDBSCAN on the TRAIN embeddings on one node,
then labels new data with ``hdbscan.approximate_predict`` and maps noise
(-1) to its own category ``max_label + 1``
(``MachineLearning/Ray/recsys/generate_data.py:838-895``). UMAP/HDBSCAN
are not in this environment, so the clusterer here is a seeded numpy
k-means with a per-cluster density radius — the same *contract*:

- ``fit_density_clusters``: driver-side fit on a bounded sample (the
  reference also fits on the collected train split — at 100 TB you fit
  on a few million sampled rows, never the corpus);
- ``approximate_predict``: the local numpy twin (nearest centroid;
  points beyond the cluster's fitted radius are noise), returning
  ``(labels, strengths)`` exactly like ``hdbscan.approximate_predict``;
- ``predict_clusters``: the distributed path — model broadcast once,
  one numpy GEMM per Arrow batch, no shuffle, bit-identical to the
  local twin (tested);
- noise points get label ``k`` (= max cluster + 1), mirroring the
  reference's ``train_labels[train_labels == -1] = max_value + 1``.

Scale shape: fit is O(sample × k × iters) on the driver; predict is
map-side only — the (k × dim) model rides the broadcast, every executor
labels its partitions independently.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructType


@dataclass(frozen=True)
class DensityClusterModel:
    """Fitted clusterer: centroids, per-cluster noise radii, and the
    label used for noise (== n_clusters, the reference's max+1)."""

    centroids: np.ndarray  # (k, dim) float64
    radii: np.ndarray  # (k,) float64 — beyond this distance => noise
    noise_label: int

    def __post_init__(self):
        assert self.centroids.ndim == 2 and len(self.radii) == len(self.centroids)


def _kmeans_fit(
    X: np.ndarray, k: int, seed: int, max_iter: int
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded Lloyd's k-means (k-means++ init). Returns (centroids,
    labels). Deterministic for a given (X, k, seed)."""
    rng = np.random.default_rng(seed)
    n = len(X)
    xsq = (X * X).sum(1)

    def dist2_to(c: np.ndarray) -> np.ndarray:
        return np.maximum(xsq - 2.0 * (X @ c) + (c * c).sum(), 0.0)

    # k-means++ seeding — O(n·d) per new center via a running min
    centers = [X[rng.integers(n)]]
    best = dist2_to(centers[0])
    for _ in range(1, k):
        total = best.sum()
        idx = rng.integers(n) if total <= 0 else rng.choice(n, p=best / total)
        centers.append(X[idx])
        np.minimum(best, dist2_to(X[idx]), out=best)
    C = np.asarray(centers, dtype=np.float64)
    labels = np.zeros(n, dtype=np.int64)
    for it in range(max_iter):
        # one GEMM: ||x||² − 2 X·Cᵀ + ||c||², never an n×k×d temp
        d2 = xsq[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        new_labels = d2.argmin(axis=1)
        if it > 0 and (new_labels == labels).all():
            break
        labels = new_labels
        for j in range(k):
            members = X[labels == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C, labels


def fit_density_clusters(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    max_sample: int = 100_000,
    max_iter: int = 25,
    noise_quantile: float = 0.95,
) -> DensityClusterModel:
    """Fit on a driver-collected sample of at most ``max_sample``
    vectors (deterministic: ordered by a row hash, not sample()'s
    partition-dependent Bernoulli draw). The per-cluster noise radius is
    the ``noise_quantile`` of member distances — predict-time points
    farther than that from their nearest centroid are noise, the
    density analog of HDBSCAN's outlier behavior."""
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("__h", F.xxhash64(F.col("v").cast("array<double>")))
        .orderBy("__h")
        .limit(max_sample)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"fit_density_clusters: {len(X)} vectors < k={k}")
    C, labels = _kmeans_fit(X, k, seed, max_iter)
    dists = np.linalg.norm(X - C[labels], axis=1)
    radii = np.zeros(k, dtype=np.float64)
    for j in range(k):
        member_d = dists[labels == j]
        radii[j] = np.quantile(member_d, noise_quantile) if len(member_d) else 0.0
    return DensityClusterModel(centroids=C, radii=radii, noise_label=k)


def approximate_predict(
    model: DensityClusterModel, X: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Local numpy twin of ``hdbscan.approximate_predict``: nearest
    centroid per row; rows beyond that cluster's radius become
    ``noise_label`` with strength 0. Strength decays linearly from 1 at
    the centroid to 0 at the radius."""
    C = model.centroids
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    np.maximum(d2, 0.0, out=d2)
    nearest = d2.argmin(axis=1)
    dist = np.sqrt(d2[np.arange(len(X)), nearest])
    r = model.radii[nearest]
    with np.errstate(divide="ignore", invalid="ignore"):
        strength = np.where(r > 0, np.clip(1.0 - dist / r, 0.0, 1.0), 1.0)
    labels = np.where(dist <= r, nearest, model.noise_label)
    strength = np.where(dist <= r, strength, 0.0)
    return labels.astype(np.int64), strength.astype(np.float64)


def predict_clusters(
    df: DataFrame,
    model: DensityClusterModel,
    vec_col: str = "embedding",
    label_col: str = "cluster",
    strength_col: str = "strength",
) -> DataFrame:
    """Distributed approximate predict: the (k × dim) model is broadcast
    once; each Arrow batch is labeled with one GEMM — map-side only, no
    shuffle, identical output to :func:`approximate_predict`."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (model.centroids, model.radii, model.noise_label)
    )
    schema_out = (
        StructType(list(df.schema.fields))
        .add(label_col, IntegerType())
        .add(strength_col, DoubleType())
    )

    def assign(batches):
        C, radii, noise = bc.value
        m = DensityClusterModel(centroids=C, radii=radii, noise_label=noise)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            labels, strength = approximate_predict(m, X)
            pdf = pdf.copy()
            pdf[label_col] = labels.astype("int32")
            pdf[strength_col] = strength
            yield pdf

    return df.mapInPandas(assign, schema_out)
