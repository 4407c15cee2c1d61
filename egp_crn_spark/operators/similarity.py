"""Similarity search over embedding columns.

Brute-force cosine top-k (the exactness baseline) and an IVF-style
coarse-quantizer ANN (the scale path): centroids from a seeded sample,
vectors assigned to nearest centroid (partition pruning), queries probe
``nprobe`` nearest centroids — candidate set shrinks by ~ncells/nprobe.

Scoring math is JVM higher-order folds (Column expressions). numpy
appears in exactly two places: centroid training (driver-side bounded
seeded sample) and the broadcast-matmul coarse quantizer — one BLAS
``X @ C.T`` per Arrow record batch inside mapInArrow, the scale path
for cell counts an unrolled literal expression cannot represent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# above this cell count the unrolled literal expression (ncells × dim
# terms) blows up plan size/compile time; the broadcast-matmul kernel
# takes over. At production IVF scale (ncells 10^4-10^6) the expression
# form is infeasible outright — the matmul path is the real scale path,
# the expression path survives only because tiny-ncells oracles want a
# pure-Column (and hence DuckDB-twin-exact) quantizer.
_EXPR_NCELLS_MAX = 16


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


def _use_expr(method: str, C: np.ndarray) -> bool:
    if method not in ("auto", "expr", "matmul"):
        raise ValueError(f"unknown quantizer method {method!r}")
    return method == "expr" or (method == "auto" and len(C) <= _EXPR_NCELLS_MAX)


def _stack(vals) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in vals])


def _assign_matmul(sel: DataFrame, C: np.ndarray) -> DataFrame:
    """(n_id, cv, cell, _cn) from (n_id, cv): one BLAS X @ C.T per Arrow
    batch against an executor-broadcast centroid matrix — O(ncells x dim)
    literals never enter the plan, so ncells 10^4-10^6 costs one matmul,
    not an expression tree. Tie-break matches the expr path (largest cell
    id wins on equal sim): argmax over the column-reversed sim matrix.
    Adapts to the input element type: an array<float> cv computes, and is
    carried, in float32 (half the Arrow/shuffle bytes of the double
    path — the stage is memory-bandwidth-bound, so bytes ARE the cost)."""
    from pyspark.sql.types import (ArrayType, DoubleType, FloatType,
                                   IntegerType, StructField, StructType)

    f32 = isinstance(sel.schema["cv"].dataType.elementType, FloatType)
    np_t = np.float32 if f32 else np.float64
    elem = FloatType() if f32 else DoubleType()
    bc = sel.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(C, dtype=np_t))
    schema = StructType([
        sel.schema["n_id"],
        StructField("cv", ArrayType(elem), True),
        StructField("cell", IntegerType(), False),
        StructField("_cn", elem, False),
    ])

    # mapInARROW, not mapInPandas: the list column's flat value buffer
    # reshapes (near-)zero-copy into the (n, dim) matmul input, and the
    # id/vector columns PASS THROUGH as the original Arrow arrays — the
    # pandas route materializes one Python ndarray object per row on
    # both directions, and that allocator churn (not the matmul) was the
    # measured cost of the build at high worker counts.
    def gen(batches):
        import pyarrow as pa

        Cb = bc.value
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            cv = b.column(b.schema.get_field_index("cv"))
            flat = cv.flatten()
            # a null or ragged vector would make flatten() drop/shift
            # values and silently misalign every later row's cell —
            # fail loudly instead, naming the column
            if cv.null_count or len(flat) != n * Cb.shape[1]:
                raise ValueError(
                    f"ivf_assign: column 'cv' has nulls or ragged "
                    f"vectors (nulls={cv.null_count}, values={len(flat)}, "
                    f"expected {n} x {Cb.shape[1]})"
                )
            X = flat.to_numpy(zero_copy_only=False).reshape(n, Cb.shape[1])
            if X.dtype != np_t:
                X = X.astype(np_t)
            sims = X @ Cb.T
            cell = (sims.shape[1] - 1 - np.argmax(sims[:, ::-1], axis=1))
            cn = np.sqrt(np.einsum("ij,ij->i", X, X, dtype=np_t))
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("n_id")), cv,
                 pa.array(cell.astype("int32"), type=pa.int32()),
                 pa.array(cn, type=pa.float32() if f32 else pa.float64())],
                ["n_id", "cv", "cell", "_cn"],
            )

    return sel.mapInArrow(gen, schema=schema)


def _probe_cells_matmul(sel: DataFrame, C: np.ndarray, nprobe: int) -> DataFrame:
    """(q_id, qv, _qn, cell) x nprobe from (q_id, qv): top-nprobe cells
    per query via one matmul per batch. Stable ascending argsort then
    reverse = sim desc with cell-id-desc tie-break — same order as the
    expr path's reverse(array_sort(struct(sim, cell)))."""
    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   StructField, StructType)

    bc = sel.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(C, dtype=np.float64))
    nprobe = min(nprobe, len(C))
    schema = StructType([
        sel.schema["q_id"],
        StructField("qv", ArrayType(DoubleType()), True),
        StructField("_qn", DoubleType(), False),
        StructField("cell", IntegerType(), False),
    ])

    def gen(it):
        Cb = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            X = _stack(pdf["qv"])
            sims = X @ Cb.T
            top = np.argsort(sims, axis=1, kind="stable")[:, ::-1][:, :nprobe]
            qn = np.sqrt(np.einsum("ij,ij->i", X, X))
            idx = np.repeat(np.arange(len(pdf)), nprobe)
            yield pd.DataFrame({
                "q_id": pdf["q_id"].to_numpy()[idx],
                "qv": pdf["qv"].iloc[idx].to_numpy(),
                "_qn": qn[idx],
                "cell": top.ravel().astype("int32"),
            })

    return sel.mapInPandas(gen, schema=schema)


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "auto",
    dtype: str = "float64",
) -> DataFrame:
    """IVF INDEX BUILD: assign each corpus vector to its nearest
    centroid — (n_id, cv, cell, _cn). O(corpus x ncells) dot products,
    paid ONCE; persist (or write bucketed by `cell` via
    sources.tables.save_bucketed_table) and serve many query batches
    from it. Norm precomputed per row (see brute_force_topk).

    method: 'expr' = pure-Column literal fold (tiny ncells; DuckDB-twin
    exact), 'matmul' = broadcast-centroid BLAS kernel (the scale path),
    'auto' = expr iff ncells <= _EXPR_NCELLS_MAX.

    dtype: 'float32' builds and CARRIES the index in single precision —
    embeddings are float32 at the source, so the double path spends 2x
    the Arrow/shuffle bytes for precision ANN scoring cannot use. The
    assignment stage is measured memory-bandwidth-bound (BENCH/ANN.md),
    so this halves its real cost; scoring in ivf_probe promotes to
    double at the arithmetic, losing nothing but the wasted bytes.
    Implies the matmul quantizer (the literal-expr fold is the
    double-exact oracle path)."""
    if dtype == "float32":
        if method == "expr":
            raise ValueError("dtype='float32' requires the matmul quantizer")
        sel = _ensure_parallelism(corpus).select(
            F.col(id_col).alias("n_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("float")).alias("cv"))
        return _assign_matmul(sel, centroids)
    if dtype != "float64":
        raise ValueError(f"unknown dtype {dtype!r}")
    sel = _ensure_parallelism(corpus).select(
        F.col(id_col).alias("n_id"), _as_double(vec_col).alias("cv"))
    if _use_expr(method, centroids):
        return sel.withColumn(
            "cell",
            F.element_at(_nearest_centroids_expr(F.col("cv"), centroids, 1), 1),
        ).withColumn("_cn", _norm(F.col("cv")))
    return _assign_matmul(sel, centroids)


def ivf_probe(
    queries: DataFrame,
    index: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    method: str = "auto",
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF QUERY: probe the nprobe nearest cells per query — a cell
    equi-join against the prebuilt index (same shape as the spatial
    prefilter), candidates shrink ~ncells/nprobe vs brute force.
    ``method`` picks the quantizer form (see ivf_assign).

    ``broadcast_queries`` (default True) hints the probe side into a
    broadcast join so the corpus index is NEVER shuffled — the serving
    shape: query batches are interactively small while the index is the
    10^9+-row side (and may be a bucketed table). This must be an
    explicit hint because the matmul quantizer emits probes through
    mapInPandas, whose unknown size statistics otherwise push Catalyst to
    a sort-merge join that shuffles the whole index. Pass False only for
    offline mega-batches where the query side rivals the corpus."""
    if _use_expr(method, centroids):
        probes = queries.select(
            "q_id", F.col("qv"), _norm(F.col("qv")).alias("_qn"),
            F.explode(_nearest_centroids_expr(F.col("qv"), centroids, nprobe)).alias("cell"),
        )
    else:
        probes = _probe_cells_matmul(queries.select("q_id", "qv"), centroids, nprobe)
    if broadcast_queries:
        probes = F.broadcast(probes)
    # norms hoisted per row (see brute_force_topk) — bit-identical cosine
    # No pair dedup needed: ivf_assign places each corpus vector in exactly
    # ONE cell and the nprobe probe cells per query are distinct, so a
    # (q_id, n_id) pair can meet at most once in this equi-join. A
    # dropDuplicates here would add a full extra exchange of the widest
    # intermediate in the serving path to remove duplicates that cannot
    # exist. tests/test_pipeline_ops.py pins this uniqueness invariant so
    # a future multi-assignment index variant can't silently double-count.
    scored = probes.join(index, "cell").filter(F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))).alias("sim"),
    )
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
    method: str = "auto",
) -> DataFrame:
    """One-shot IVF top-k = ivf_assign + ivf_probe. For repeated query
    batches build the index once with ivf_assign and call ivf_probe —
    the assignment is the dominant cost and amortizes across batches."""
    C = centroids if centroids is not None else train_centroids(
        corpus, ncells, vec_col, id_col=id_col)
    return ivf_probe(queries, ivf_assign(corpus, C, vec_col, id_col, method),
                     C, k, nprobe, method)
