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


def _norm(vec) -> "F.Column":
    return F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x),
                              F.lit(0.0), lambda s, v: s + v))


def _dot(a, b) -> "F.Column":
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda s, v: s + v)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(q_id, n_id, rank): exact top-k by cosine (desc, id asc tie-break).
    queries: (q_id, vec). corpus: (id_col, vec_col). Exhaustive —
    baseline only; the corpus side streams, queries broadcast.

    Norms are precomputed per ROW, not per pair: cosine_sim() inside the
    cross join would fold each side's norm |queries| times — hoisting
    them cuts the per-pair work to one dot product (3x fewer flops;
    dot / (qn * cn) keeps the exact operand order of cosine_sim, so
    results are bit-identical)."""
    q = F.broadcast(queries.select(
        F.col("q_id"), F.col("qv"), _norm(F.col("qv")).alias("_qn")))
    c = _ensure_parallelism(
        corpus.select(F.col(id_col).alias("n_id"), _as_double(vec_col).alias("cv")))
    c = c.withColumn("_cn", _norm(F.col("cv")))
    scored = q.crossJoin(c).filter(F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))).alias("sim"),
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
    The sample is the top-``sample`` rows by xxhash64(id) — deterministic
    (a bare limit() takes whichever partitions answer first, making every
    downstream ANN result run-order dependent) AND unbiased for
    id-ordered corpora (the first N ids of a source/time-ordered table
    are not a representative slice; a hash order is)."""
    pdf = (
        corpus.select(F.col(id_col), _as_double(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
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


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF INDEX BUILD: assign each corpus vector to its nearest
    centroid — (n_id, cv, cell, _cn). O(corpus x ncells) dot products,
    paid ONCE; persist (or write bucketed by `cell` via
    sources.tables.save_bucketed_table) and serve many query batches
    from it. Norm precomputed per row (see brute_force_topk)."""
    cvec = _as_double(vec_col)
    return _ensure_parallelism(corpus).select(
        F.col(id_col).alias("n_id"),
        cvec.alias("cv"),
        F.element_at(_nearest_centroids_expr(cvec, centroids, 1), 1).alias("cell"),
    ).withColumn("_cn", _norm(F.col("cv")))


def ivf_probe(
    queries: DataFrame,
    index: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF QUERY: probe the nprobe nearest cells per query — a cell
    equi-join against the prebuilt index (same shape as the spatial
    prefilter), candidates shrink ~ncells/nprobe vs brute force."""
    probes = queries.select(
        "q_id", F.col("qv"), _norm(F.col("qv")).alias("_qn"),
        F.explode(_nearest_centroids_expr(F.col("qv"), centroids, nprobe)).alias("cell"),
    )
    # norms hoisted per row (see brute_force_topk) — bit-identical cosine
    scored = probes.join(index, "cell").filter(F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))).alias("sim"),
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


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
    """One-shot IVF top-k = ivf_assign + ivf_probe. For repeated query
    batches build the index once with ivf_assign and call ivf_probe —
    the assignment is the dominant cost and amortizes across batches."""
    C = centroids if centroids is not None else train_centroids(
        corpus, ncells, vec_col, id_col=id_col)
    return ivf_probe(queries, ivf_assign(corpus, C, vec_col, id_col), C, k, nprobe)
