"""Benchmark runner — prints ONE JSON line per the driver contract.

Headline queries:
- tile_assign: phash→(x,y)→cell/tile assignment over the synthetic images
  table (the BASELINE.json "spatial-join + tile-assignment" metric; table
  size scales with SPARK_GRAFT_SF_DIR's sf).
- pip_images: point-in-polygon join of the image points into the convex
  boundary tiles (cell prefilter + numpy refine).
- conflation / distance_join / knn_nearest / node_degree / dup_geometry /
  sessionize / pricing_summary: driver-table operator queries (driverq).

Usage: python bench.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from egp_crn_spark.config import env_cpus, env_sf_dir  # noqa: E402
from egp_crn_spark.functions import cells as C  # noqa: E402
from egp_crn_spark.functions.georef import phash_x, phash_y  # noqa: E402

IMAGES_PER_SF = 5_000_000  # sf0.1 → 500k rows (override: SPARK_GRAFT_N_IMAGES)
BOUNDARY_RES = 4  # 256 convex tiles

# ANN serving row: ivf_probe against a PREBUILT bucketed index — the
# headline ANN number is the scale path (index built once, amortized),
# per VERDICT r5 #2; brute-force embedding_topk stays as the fenced
# exactness baseline over the driver tables.
ANN_VECS_PER_SF = 2_000_000  # sf0.1 → 200k vectors
PYR_IMAGES_PER_SF = 2_000_000  # sf0.1 → 200k bytes-bearing pyramid images
ANN_DIM = 64
ANN_NCELLS = 1024  # measured: 2.6s @64c, 1.3s @256c, 1.1s @1024c, recall@10=1.0 throughout
ANN_NPROBE = 8
ANN_K = 10
ANN_NQUERIES = 50
ANN_PQ_M = 16  # PQ bytes/vector — the >=0.9-recall point (BENCH/ANN.md)


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def ensure_images(n: int, cache_root: str = None, shards: int = 64) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from egp_crn_spark.synth import make_boundaries, make_images

    cache_root = cache_root or os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data")
    os.makedirs(cache_root, exist_ok=True)
    # sharded dataset dir: a single parquet file scans as ONE task and
    # serializes the whole bench — shard so every core gets scan work
    img_path = os.path.join(cache_root, f"bench_images_{n}")
    bnd_path = os.path.join(cache_root, f"bench_boundaries_r{BOUNDARY_RES}.parquet")
    if not os.path.isdir(img_path) or len(os.listdir(img_path)) < shards:
        pdf = make_images(n, seed=42, with_bytes=False, fast_ids=n > 1_000_000).drop(
            columns=["bytes"])
        os.makedirs(img_path, exist_ok=True)
        step = (len(pdf) + shards - 1) // shards
        for s in range(shards):
            chunk = pdf.iloc[s * step : (s + 1) * step]
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                os.path.join(img_path, f"part-{s:03d}.parquet"),
            )
    if not os.path.exists(bnd_path):
        pdf = make_boundaries(res=BOUNDARY_RES, seed=42)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), bnd_path)
    return img_path, bnd_path


def image_points(spark, img_path):
    return spark.read.parquet(img_path).select(
        "image_id",
        phash_x(F.col("phash")).alias("x"),
        phash_y(F.col("phash")).alias("y"),
    )


def q_tile_assign(spark, img_path, bnd_path):
    pts = image_points(spark, img_path)
    cell10 = C.cell_of_xy(F.col("x"), F.col("y"), 10)
    return (
        pts.select("image_id", cell10.alias("cell10"),
                   C.parent_cell(cell10, 10, BOUNDARY_RES).alias("tile"))
        .groupBy("tile").agg(F.count("*").alias("n"), F.approx_count_distinct("cell10").alias("cells"))
    )


def q_pip_images(spark, img_path, bnd_path):
    from egp_crn_spark.operators.spatial_join import point_in_polygon_join

    pts = image_points(spark, img_path).withColumnRenamed("image_id", "p_id")
    polys = spark.read.parquet(bnd_path).select(
        F.col("bb_uid").alias("poly_id"), "vertices"
    )
    joined = point_in_polygon_join(pts, polys, res=6, broadcast_polys=True)
    return joined.groupBy("poly_id").agg(F.count("*").alias("n"))


def ensure_pyramid_images(spark, n: int) -> str:
    """Bytes-bearing georeferenced image table for the tile-pyramid row
    (the main bench images table is metadata-only): n uniform points,
    one 16×16 stand-in PNG each, built distributed ONCE and cached in
    .data — the bench times the pyramid build, not fixture synthesis."""
    cache_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data")
    path = os.path.join(cache_root, f"bench_pyr_images_{n}")
    if os.path.isdir(path) and os.listdir(path):
        return path

    def gen(it):
        import numpy as np
        import pandas as pd

        from egp_crn_spark.functions.imagecodec import encode_image
        for pdf in it:
            px = [encode_image(
                np.full((16, 16, 3), int(i) % 251, np.uint8), "png")
                for i in pdf["image_id"]]
            yield pd.DataFrame({"image_id": pdf["image_id"],
                                "phash": pdf["phash"], "bytes": px})

    mod = F.lit(1 << 32)
    (spark.range(n).select(
        F.col("id").alias("image_id"),
        F.shiftleft(F.pmod(F.xxhash64("id", F.lit(1)), mod), 32)
        .bitwiseOR(F.pmod(F.xxhash64("id", F.lit(2)), mod))
        .cast("long").alias("phash"))
     .repartition(64)
     .mapInPandas(gen, "image_id long, phash long, bytes binary")
     .write.mode("overwrite").parquet(path))
    return path


def ensure_ann_index(spark, n_vecs: int, cpus: int):
    """(queries_thunk, corpus, index_df, centroids, codebooks, pq_index):
    corpus parquet + trained centroids/PQ codebooks + float32 IVF index
    as a bucketed table + compressed PQ index parquet, all built ONCE
    and cached in .data / spark-warehouse — the bench times only the
    serving paths (ivf_probe / ivf_pq_probe), which repeat in
    production."""
    import numpy as np

    from egp_crn_spark.operators.similarity import (ivf_assign,
                                                    ivf_pq_assign,
                                                    train_centroids,
                                                    train_pq)
    from egp_crn_spark.sources.tables import save_bucketed_table
    from egp_crn_spark.synth import synth_vectors

    cache_root = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".data")
    os.makedirs(cache_root, exist_ok=True)
    corp_path = os.path.join(cache_root, f"bench_ann_{n_vecs}")
    if not os.path.isdir(corp_path):
        synth_vectors(spark, n_vecs, dim=ANN_DIM).repartition(cpus * 2) \
            .write.mode("overwrite").parquet(corp_path)
    corpus = spark.read.parquet(corp_path)
    cent_path = os.path.join(cache_root, f"bench_ann_cent_{n_vecs}_{ANN_NCELLS}.npy")
    if os.path.exists(cent_path):
        C = np.load(cent_path)
    else:
        C = train_centroids(corpus, ANN_NCELLS)
        np.save(cent_path, C)
    tbl = f"bench_ivf_idx_{n_vecs}"
    try:
        ok = spark.catalog.tableExists(tbl) and spark.table(tbl).limit(1).count() == 1
    except Exception:
        ok = False
    if not ok:
        # the default (non-Hive) catalog is in-memory: a managed table
        # built by a PREVIOUS bench process is gone from the catalog but
        # its warehouse directory survives, and the re-create fails with
        # LOCATION_ALREADY_EXISTS — resolve the real location when known,
        # else the default layout, and clear the orphan before rebuilding
        import shutil
        from urllib.parse import urlparse

        loc = None
        if spark.catalog.tableExists(tbl):
            desc = spark.sql(f"describe extended {tbl}").collect()
            loc = next((r.data_type for r in desc if r.col_name == "Location"), None)
        spark.sql(f"drop table if exists {tbl}")
        if loc is None:
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
            loc = os.path.join(wh, tbl.lower())
        else:
            loc = urlparse(loc).path or loc
        if os.path.exists(loc):
            shutil.rmtree(loc, ignore_errors=True)
        save_bucketed_table(ivf_assign(corpus, C, dtype="float32"), tbl,
                            "cell", num_buckets=min(ANN_NCELLS, cpus))
    index = spark.table(tbl)
    book_path = os.path.join(cache_root,
                             f"bench_ann_pq_{n_vecs}_{ANN_PQ_M}.npy")
    if os.path.exists(book_path):
        B = np.load(book_path)
    else:
        B = train_pq(corpus, C, m=ANN_PQ_M)
        np.save(book_path, B)
    pq_path = os.path.join(cache_root, f"bench_ann_pqidx_{n_vecs}_{ANN_PQ_M}")
    if not os.path.isdir(pq_path):
        ivf_pq_assign(corpus, C, B).write.mode("overwrite").parquet(pq_path)
    pq_index = spark.read.parquet(pq_path)
    step = max(n_vecs // ANN_NQUERIES, 1)

    def queries():
        return corpus.filter(F.col("vec_id") % step == 0).select(
            F.col("vec_id").alias("q_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )

    return queries, corpus, index, C, B, pq_index


def main() -> None:
    sf_dir = env_sf_dir()
    cpus = env_cpus()
    sf = sf_of(sf_dir)
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", 0)) or max(int(IMAGES_PER_SF * sf), 1000)
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    img_path, bnd_path = ensure_images(n_images)

    from egp_crn_spark.driverq import QUERIES
    from egp_crn_spark.session import get_session

    spark = get_session("bench", cores=cpus)

    # Trials are INTERLEAVED: the full query sweep runs `trials` times and
    # each query keeps its min across passes. Back-to-back trials of one
    # query share any multi-second CPU-steal burst on this shared VM (the
    # r4 capture read ~50% high that way); interleaving puts each query's
    # trials ~a full sweep apart so a burst lands on different queries in
    # different passes and the per-query min shakes it off.
    queries: list[tuple[str, object]] = []
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    rows: dict[str, int] = {}
    steal_per_pass: list[float] = []

    def run(name, make_df):
        queries.append((name, make_df))

    def _cpu_stat():
        """(total_jiffies, steal_jiffies) from /proc/stat — shared-VM
        host-steal instrumentation (VERDICT r7 #2): a capture landing in
        a steal window is self-evident in the artifact instead of
        needing a counter-run to adjudicate."""
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [int(x) for x in parts[1:]]
            steal = vals[7] if len(vals) > 7 else 0
            return sum(vals), steal
        except Exception:
            return None

    def execute_all():
        trial_times: dict[str, list[float]] = {n: [] for n, _ in queries}
        for p in range(trials):
            s0 = _cpu_stat()
            for name, make_df in queries:
                # make_df is a THUNK: a fresh DataFrame per trial, because
                # Spark silently reuses shuffle map-stage output across
                # actions on the same DataFrame object — timing a reused
                # df measures only the final stage.
                df = make_df()
                t0 = time.perf_counter()
                n = df.count()
                el = time.perf_counter() - t0
                trial_times[name].append(el)
                rows[name] = n
            s1 = _cpu_stat()
            if s0 and s1 and s1[0] > s0[0]:
                steal_per_pass.append(
                    round(100.0 * (s1[1] - s0[1]) / (s1[0] - s0[0]), 2))
        for name, ts in trial_times.items():
            timings[name] = round(min(ts), 3)
            spreads[name] = round(max(ts) - min(ts), 3)

    # warm the JVM/codegen AND the Python-worker daemon pool: the first
    # Arrow-UDF stage otherwise pays ~0.5 s/core of simultaneous
    # fork+import cost, which would be misattributed to the first query
    spark.range(1000).count()
    import pandas as _pd

    def _noop(it):
        for pdf in it:
            yield pdf

    (spark.range(cpus * 4).repartition(cpus * 4)
     .mapInPandas(_noop, schema="id long").count())

    run("tile_assign", lambda: q_tile_assign(spark, img_path, bnd_path))
    run("pip_images", lambda: q_pip_images(spark, img_path, bnd_path))
    for name in ["conflation_crn", "distance_join", "knn_nearest", "node_degree",
                 "dup_geometry", "sessionize", "pricing_summary", "pip_quads",
                 "minhash_lsh_dup", "embedding_topk", "segment_split",
                 "neighbour_review", "token_stats",
                 # topology pair-validations (round-3 column-pruned path)
                 "v303_crosses", "v302_min_distance"]:
        fn = QUERIES[name][0]
        run(name, lambda fn=fn: fn(spark, sf_dir))

    # production hash paths (the driver-contract twins above run md5
    # oracle mode; users run xxhash64 — bench BOTH per VERDICT r1 item 6)
    from egp_crn_spark.operators.dedup import dedup_minhash_lsh, dedup_simhash

    docs = lambda: spark.read.parquet(f"{sf_dir}/documents.parquet")  # noqa: E731
    run("minhash_lsh_xx", lambda: dedup_minhash_lsh(
        docs(), num_hashes=8, bands=4, threshold=0.5, use_md5=False))
    run("simhash_xx", lambda: dedup_simhash(docs(), max_hamming=3))

    # image-payload near-dup on the REAL phash column of the synthetic
    # images table (clustered urban phashes exercise the bucket cap)
    from egp_crn_spark.operators.images import phash_near_dup

    run("phash_near_dup", lambda: phash_near_dup(
        spark.read.parquet(img_path), max_hamming=2, max_bucket=200))

    # raster tile pyramid: rep-select + decode at res 7, three rollup
    # levels down to res 4 (operators/pyramid.py). build_pyramid caches
    # each level, and Spark's CacheManager matches by analyzed plan — a
    # plan-identical thunk on a later pass would silently count the
    # PREVIOUS pass's cached levels (~0.4 s instead of the real build).
    # So the row materializes level by level with its own caches and
    # unpersists them before returning: every pass pays full compute.
    from egp_crn_spark.operators.pyramid import base_tiles, rollup_level

    n_pyr = int(os.environ.get("SPARK_GRAFT_PYR_IMAGES", 0)) or max(
        int(PYR_IMAGES_PER_SF * sf), 20_000)
    pyr_path = ensure_pyramid_images(spark, n_pyr)

    class _CountThunk:
        def __init__(self, fn):
            self._fn = fn

        def count(self):
            return self._fn()

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

    run("tile_pyramid", lambda: _CountThunk(_pyramid_pass))

    # ANN serving: probe a prebuilt bucketed IVF index (build amortized,
    # not timed — see ensure_ann_index); queries broadcast so the index
    # side never shuffles
    from egp_crn_spark.operators.similarity import ivf_pq_probe, ivf_probe

    n_ann = int(os.environ.get("SPARK_GRAFT_ANN_VECS", 0)) or max(
        int(ANN_VECS_PER_SF * sf), 10_000)
    (ann_queries, ann_corpus, ann_index, ann_C, ann_B,
     ann_pq_index) = ensure_ann_index(spark, n_ann, cpus)
    run("ivf_probe", lambda: ivf_probe(
        ann_queries(), ann_index, ann_C, k=ANN_K, nprobe=ANN_NPROBE))
    # compressed serving: ADC over the 10.8x-smaller PQ index + exact
    # re-rank of the finalists against the corpus (recall 0.93 at 1M,
    # BENCH/ANN.md) — the shape a petabyte-scale index actually runs
    run("ivf_pq_probe", lambda: ivf_pq_probe(
        ann_queries(), ann_pq_index, ann_C, ann_B, k=ANN_K,
        nprobe=ANN_NPROBE, refine_corpus=ann_corpus))

    execute_all()
    total = round(sum(timings.values()), 3)
    spatial_rows = n_images  # rows pushed through tile assignment + PIP
    print(json.dumps({
        "metric": "spatial-join + tile-assignment bench (sum of per-query "
                  f"min-of-{trials} interleaved wall times)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "steal_pct_per_pass": steal_per_pass,
        "trials": trials,
        "sf": sf,
        "cpus": cpus,
        "n_images": n_images,
        "rows_per_sec_tile_assign": round(spatial_rows / timings["tile_assign"], 1),
        "rows_per_sec_pip": round(spatial_rows / timings["pip_images"], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
