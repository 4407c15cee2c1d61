"""One scaling-bench subprocess: run the three scaling jobs once each at
SPARK_GRAFT_CPUS and print {"secs": {job: seconds}}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import BOUNDARY_RES, ensure_images, image_points, q_pip_images, q_tile_assign  # noqa: E402
from egp_crn_spark.functions import geomkernel as GK  # noqa: E402
from egp_crn_spark.session import get_session  # noqa: E402


def main() -> None:
    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", "20000000"))
    img_path, bnd_path = ensure_images(n_images)
    # SPARK_GRAFT_MASTER may point at local-cluster[N,c,mMB] (real
    # separate executor JVMs); give those executors a concrete heap
    extra = {}
    if os.environ.get("SPARK_GRAFT_MASTER", "").startswith("local-cluster"):
        extra["spark.executor.memory"] = os.environ.get(
            "SPARK_GRAFT_EXECUTOR_MEM", "3g")
    spark = get_session("scaling-worker", cores=cpus, driver_memory="24g",
                        extra_conf=extra)

    # warm JVM + the Python worker daemon pool
    spark.range(1000).count()

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(cpus * 4).repartition(cpus * 4).mapInPandas(_noop, schema="id long").count()

    secs: dict[str, float] = {}

    def run(name, make_df):
        df = make_df()
        t0 = time.perf_counter()
        df.count()
        secs[name] = round(time.perf_counter() - t0, 3)

    def tile4x():
        # 4-way self-union: a short pure-JVM job at 20M rows is dominated
        # by task dispatch; 80M scanned rows measures actual throughput
        pts = image_points(spark, img_path)
        df = pts.unionByName(pts).unionByName(pts).unionByName(pts)
        from egp_crn_spark.functions import cells as C
        cell10 = C.cell_of_xy(F.col("x"), F.col("y"), 10)
        return df.select(cell10.alias("c"), C.parent_cell(cell10, 10, BOUNDARY_RES)
                         .alias("tile")).groupBy("tile").count()

    run("tile_assign", tile4x)
    run("pip_images", lambda: q_pip_images(spark, img_path, bnd_path))

    # Python-compute-bound kernel: exact PIP of EVERY image point against a
    # fixed 64-vertex polygon, 20 passes over CACHE-BLOCKED chunks — per-core
    # compute with an L2-resident working set and a tiny Arrow payload, so
    # it measures core scaling rather than the single VM's memory bus.
    theta = np.linspace(0, 2 * np.pi, 65)[:-1]
    poly = np.stack([32768 + 20000 * np.cos(theta), 32768 + 20000 * np.sin(theta)], axis=1)

    @F.pandas_udf("boolean")
    def in_poly(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.values.astype(np.float64)
        ys = y.values.astype(np.float64)
        out = np.zeros(len(xs), dtype=bool)
        block = 2048
        for s in range(0, len(xs), block):
            xb, yb = xs[s : s + block], ys[s : s + block]
            k = GK.points_in_polygon(xb, yb, poly)
            for _ in range(19):
                k &= GK.points_in_polygon(xb, yb, poly)
            out[s : s + block] = k
        return pd.Series(out)

    def kernel_df():
        pts = image_points(spark, img_path).repartition(cpus * 4)
        return pts.filter(in_poly(F.col("x"), F.col("y"))).groupBy().count()

    run("refine_kernel", kernel_df)

    # IVF centroid assignment: the broadcast-matmul quantizer (one BLAS
    # X @ C.T per Arrow batch in mapInArrow — similarity._assign_matmul)
    # over 1M x 64-dim vectors at 64 cells — BLAS-bound per-core
    # compute, the ANN index-build stage.
    n_vecs = 1_000_000
    vec_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", f"ann_demo_v2_{n_vecs}")
    if not os.path.isdir(vec_path):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ann_demo import synth_vectors

        synth_vectors(spark, n_vecs).repartition(cpus * 4).write.mode(
            "overwrite").parquet(vec_path)
    corpus = spark.read.parquet(vec_path)
    rng = np.random.default_rng(42)
    cmat = rng.standard_normal((64, 64))
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    from egp_crn_spark.operators.similarity import ivf_assign

    run("ivf_assign", lambda: ivf_assign(corpus, cmat, dtype="float32")
        .groupBy("cell").count())

    # IVF-PQ encode: the fused coarse-assign + residual + per-subspace
    # argmin kernel (similarity.ivf_pq_assign) — heavier per-row numpy
    # compute than the plain quantizer (m extra small matmuls/argmins
    # per batch), the compressed-index build stage.
    from egp_crn_spark.operators.similarity import ivf_pq_assign

    bmat = rng.standard_normal((16, 256, 4)) * 0.05
    # 4-way self-union: at 1M rows the encode is task-overhead bound
    # (the same reason tile_assign unions 4x) — 4M rows makes the
    # per-batch numpy work the measured quantity
    corpus4 = corpus.unionByName(corpus).unionByName(corpus).unionByName(corpus)
    run("pq_encode", lambda: ivf_pq_assign(corpus4, cmat, bmat)
        .groupBy("cell").agg(F.count("*"), F.max(F.length("codes"))))

    rows = {"tile_assign": 4 * n_images, "pip_images": n_images,
            "refine_kernel": n_images, "ivf_assign": n_vecs,
            "pq_encode": 4 * n_vecs}
    print(json.dumps({"secs": secs, "rows": rows, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
