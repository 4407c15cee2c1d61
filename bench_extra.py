"""Per-query bench isolation (guide §1.4) — NOT the driver bench.

Reuses the frozen bench.py query builders; times a chosen subset with
the same count()-based methodology (so numbers are comparable to
bench.py rows) and optionally with the noop sink (full-column compute).

Usage: python bench_extra.py [--noop] [--trials N] query [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (the bench.py contract).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402

from egp_crn_spark.config import env_cpus, env_sf_dir  # noqa: E402
from egp_crn_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    noop = "--noop" in args
    trials = 3
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i:i + 2]
    names = [a for a in args if not a.startswith("--")]

    sf_dir = env_sf_dir()
    cpus = env_cpus()
    sf = bench.sf_of(sf_dir)
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", 0)) or max(
        int(bench.IMAGES_PER_SF * sf), 1000)
    img_path, bnd_path = bench.ensure_images(n_images)
    spark = get_session("bench-extra", cores=cpus)

    from egp_crn_spark.driverq import QUERIES
    from egp_crn_spark.operators.dedup import dedup_minhash_lsh, dedup_simhash
    from egp_crn_spark.operators.images import phash_near_dup
    from egp_crn_spark.operators.pyramid import base_tiles, rollup_level
    from egp_crn_spark.operators.similarity import ivf_pq_probe, ivf_probe

    # same warmup as bench.py
    spark.range(1000).count()

    def _noop_warm(it):
        for pdf in it:
            yield pdf
    (spark.range(cpus * 4).repartition(cpus * 4)
     .mapInPandas(_noop_warm, schema="id long").count())

    docs = lambda: spark.read.parquet(f"{sf_dir}/documents.parquet")  # noqa: E731

    class _CountThunk:
        def __init__(self, fn):
            self._fn = fn

        def count(self):
            return self._fn()

    builders = {}
    for name in ["conflation_crn", "distance_join", "knn_nearest",
                 "node_degree", "dup_geometry", "sessionize",
                 "pricing_summary", "pip_quads", "minhash_lsh_dup",
                 "embedding_topk", "segment_split", "neighbour_review",
                 "token_stats", "v303_crosses", "v302_min_distance"]:
        fn = QUERIES[name][0]
        builders[name] = lambda fn=fn: fn(spark, sf_dir)
    builders["tile_assign"] = lambda: bench.q_tile_assign(spark, img_path, bnd_path)
    builders["pip_images"] = lambda: bench.q_pip_images(spark, img_path, bnd_path)
    builders["minhash_lsh_xx"] = lambda: dedup_minhash_lsh(
        docs(), num_hashes=8, bands=4, threshold=0.5, use_md5=False)
    builders["simhash_xx"] = lambda: dedup_simhash(docs(), max_hamming=3)
    builders["phash_near_dup"] = lambda: phash_near_dup(
        spark.read.parquet(img_path), max_hamming=2, max_bucket=200)

    if "tile_pyramid" in names:
        n_pyr = int(os.environ.get("SPARK_GRAFT_PYR_IMAGES", 0)) or max(
            int(bench.PYR_IMAGES_PER_SF * sf), 20_000)
        pyr_path = bench.ensure_pyramid_images(spark, n_pyr)

        def _pyramid_pass():
            total = 0
            cached = []
            lvl = base_tiles(spark.read.parquet(pyr_path), 7, tile_px=8)
            for _r in range(7, 4, -1):
                lvl = lvl.cache()
                cached.append(lvl)
                total += lvl.count()
                lvl = rollup_level(lvl, tile_px=8)
            total += lvl.count()
            for c in cached:
                c.unpersist(blocking=False)
            return total

        builders["tile_pyramid"] = lambda: _CountThunk(_pyramid_pass)

    if "ivf_probe" in names or "ivf_pq_probe" in names:
        n_ann = int(os.environ.get("SPARK_GRAFT_ANN_VECS", 0)) or max(
            int(bench.ANN_VECS_PER_SF * sf), 10_000)
        (ann_queries, ann_corpus, ann_index, ann_C, ann_B,
         ann_pq_index) = bench.ensure_ann_index(spark, n_ann, cpus)
        builders["ivf_probe"] = lambda: ivf_probe(
            ann_queries(), ann_index, ann_C, k=bench.ANN_K,
            nprobe=bench.ANN_NPROBE)
        builders["ivf_pq_probe"] = lambda: ivf_pq_probe(
            ann_queries(), ann_pq_index, ann_C, ann_B, k=bench.ANN_K,
            nprobe=bench.ANN_NPROBE, refine_corpus=ann_corpus)

    out = {}
    for name in names:
        mk = builders[name]
        ts = []
        rows = None
        for _ in range(trials):
            df = mk()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            if noop and hasattr(df, "write"):
                df.write.format("noop").mode("overwrite").save()
            else:
                rows = df.count()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(ts), "samples": ts, "rows": rows}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
