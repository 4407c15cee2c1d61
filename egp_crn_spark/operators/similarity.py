"""Similarity search over embedding columns.

Brute-force cosine top-k (the exactness baseline) and an IVF-style
coarse-quantizer ANN (the scale path): centroids from a seeded sample,
vectors assigned to nearest centroid (partition pruning), queries probe
``nprobe`` nearest centroids — candidate set shrinks by ~ncells/nprobe.

All distance math is JVM higher-order folds (functions are Column
expressions); only centroid training touches numpy, on a driver-side
sample (bounded, seeded).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _ensure_parallelism, cosine_sim


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(q_id, n_id, rank): exact top-k by cosine (desc, id asc tie-break).
    queries: (q_id, vec). corpus: (id_col, vec_col). Exhaustive —
    baseline only; the corpus side streams, queries broadcast."""
    q = F.broadcast(queries.select(F.col("q_id"), F.col("qv")))
    c = _ensure_parallelism(
        corpus.select(F.col(id_col).alias("n_id"), _as_double(vec_col).alias("cv")))
    scored = q.crossJoin(c).filter(F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", cosine_sim(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def train_centroids(corpus: DataFrame, ncells: int, vec_col: str = "embedding",
                    sample: int = 4096, iters: int = 5, seed: int = 7,
                    id_col: str = "vec_id") -> np.ndarray:
    """k-means on a seeded driver-side sample (classic IVF training).
    The sample is orderBy(id_col).limit(sample) — a bare limit() takes
    whichever partitions answer first, which would make the centroids
    (and every downstream ANN result) run-order dependent."""
    pdf = (
        corpus.select(F.col(id_col), _as_double(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    X = np.asarray([list(v) for v in pdf["v"]], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(ncells, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def _nearest_centroids_expr(vec, C: np.ndarray, nprobe: int):
    """Array of the nprobe nearest centroid ids — pure Column fold over a
    literal centroid matrix (small: ncells × dim)."""
    sims = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(vec, F.array(*[F.lit(float(x)) for x in C[j]]), lambda a, b: a * b),
                F.lit(0.0), lambda s, v: s + v,
            ).alias("sim"),
            F.lit(j).alias("cell"),
        )
        for j in range(len(C))
    ])
    top = F.slice(F.reverse(F.array_sort(sims)), 1, nprobe)
    return F.transform(top, lambda s: s["cell"])


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus bucketed by nearest centroid,
    queries probe their nprobe nearest cells — the candidate join is a
    cell equi-join (same shape as the spatial prefilter)."""
    C = centroids if centroids is not None else train_centroids(
        corpus, ncells, vec_col, id_col=id_col)
    cvec = _as_double(vec_col)
    bucketed = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("n_id"),
        cvec.alias("cv"),
        F.element_at(_nearest_centroids_expr(cvec, C, 1), 1).alias("cell"),
    )
    probes = queries.select(
        "q_id", F.col("qv"),
        F.explode(_nearest_centroids_expr(F.col("qv"), C, nprobe)).alias("cell"),
    )
    scored = probes.join(bucketed, "cell").filter(F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", cosine_sim(F.col("qv"), F.col("cv")).alias("sim")
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )
