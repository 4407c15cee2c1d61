"""Capture .explain("formatted") for bench queries into plans/r09/.

Usage: python tools/plan_capture.py before|after [query ...]
(env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same contract as bench.py)

Writes plans/r09/<query>_<tag>.txt for each named query (default: the
full set the round-9 optimization pass touches). Driver-side only — no
query is executed (except the bounded collects some operators do at
DataFrame-construction time, e.g. the PIP polygon broadcast).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the frozen bench's query builders)
from pyspark.sql import functions as F  # noqa: E402

from egp_crn_spark.config import env_cpus, env_sf_dir  # noqa: E402
from egp_crn_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = env_sf_dir()
    cpus = env_cpus()
    sf = bench.sf_of(sf_dir)
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", 0)) or max(
        int(bench.IMAGES_PER_SF * sf), 1000)
    img_path, bnd_path = bench.ensure_images(n_images)
    spark = get_session("plan-capture", cores=cpus)

    from egp_crn_spark.driverq import QUERIES
    from egp_crn_spark.operators.dedup import dedup_minhash_lsh, dedup_simhash
    from egp_crn_spark.operators.images import phash_near_dup
    from egp_crn_spark.operators.pyramid import base_tiles, rollup_level
    from egp_crn_spark.operators.similarity import ivf_pq_probe, ivf_probe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    builders = {}
    for name in ["knn_nearest", "distance_join", "minhash_lsh_dup",
                 "embedding_topk", "pip_quads", "v302_min_distance",
                 "segment_split"]:
        fn = QUERIES[name][0]
        builders[name] = lambda fn=fn: fn(spark, sf_dir)
    builders["tile_assign"] = lambda: bench.q_tile_assign(spark, img_path, bnd_path)
    builders["pip_images"] = lambda: bench.q_pip_images(spark, img_path, bnd_path)
    builders["minhash_lsh_xx"] = lambda: dedup_minhash_lsh(
        docs, num_hashes=8, bands=4, threshold=0.5, use_md5=False)
    builders["simhash_xx"] = lambda: dedup_simhash(docs, max_hamming=3)
    builders["phash_near_dup"] = lambda: phash_near_dup(
        spark.read.parquet(img_path), max_hamming=2, max_bucket=200)

    n_pyr = int(os.environ.get("SPARK_GRAFT_PYR_IMAGES", 0)) or max(
        int(bench.PYR_IMAGES_PER_SF * sf), 20_000)
    pyr_path = bench.ensure_pyramid_images(spark, n_pyr)
    builders["tile_pyramid"] = lambda: rollup_level(
        base_tiles(spark.read.parquet(pyr_path), 7, tile_px=8), tile_px=8)

    n_ann = int(os.environ.get("SPARK_GRAFT_ANN_VECS", 0)) or max(
        int(bench.ANN_VECS_PER_SF * sf), 10_000)
    (ann_queries, ann_corpus, ann_index, ann_C, ann_B,
     ann_pq_index) = bench.ensure_ann_index(spark, n_ann, cpus)
    builders["ivf_probe"] = lambda: ivf_probe(
        ann_queries(), ann_index, ann_C, k=bench.ANN_K, nprobe=bench.ANN_NPROBE)
    builders["ivf_pq_probe"] = lambda: ivf_pq_probe(
        ann_queries(), ann_pq_index, ann_C, ann_B, k=bench.ANN_K,
        nprobe=bench.ANN_NPROBE, refine_corpus=ann_corpus)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r09")
    os.makedirs(out_dir, exist_ok=True)
    for name, mk in builders.items():
        if only and name not in only:
            continue
        df = mk()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
