"""Tile-pyramid demo at 2M images: full build vs regional incremental
repair over a cell-clustered catalog table.

The realistic churn for a 10^12-image map stack is REGIONAL — a new
imagery vintage lands over one area (egp-crn's per-province NGD
vintages, fetch_deltas.py:166-233) — so this demo re-captures every
image inside one 1/64-area bbox (delete all, insert the new vintage)
and repairs the pyramid with pyramid_update. The corpus lives in a
snaplog table with `sort_cols=["cell"]`, so the bbox is ONE contiguous
Morton cell range (the region is a 32×32 cell block aligned to its own
size) and the dirty-member read is manifest-pruned to the few files
whose cell ranges intersect it. Wall times are min-of-2 interleaved
(this VM steals); the layout-independent scale numbers — files/rows
scanned, tiles recomputed — are reported alongside, because at 65k base
cells Spark stage overhead is a large constant in every leg, while at
10^12 images the touched-data ratio is the whole story.

Honest boundary: spatially UNIFORM churn defeats both the file pruning
and the subtree locality (1k uniformly-spread dirty cells touch every
file and most parents); there a full rebuild wins and this file says so.

Usage: python tools/pyramid_demo.py [n_images] [out_md]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_pyramid_images
from egp_crn_spark.functions import cells as C
from egp_crn_spark.functions.georef import phash_x, phash_y
from egp_crn_spark.operators.cluster import skipping_report
from egp_crn_spark.operators.pyramid import build_pyramid, pyramid_update
from egp_crn_spark.session import get_session
from egp_crn_spark.sources.snaplog import SnapshotLogTable

RES, MIN_RES, PX = 8, 4, 8
N_FILES = 64
# regional churn: one 1/64-area bbox, aligned so its res-8 cells form a
# single contiguous Morton range (a 32x32 block at a multiple of 32)
REGION = (8192.0, 16384.0, 24576.0, 32768.0)  # x0, x1, y0, y1


def _sig(pyr):
    return (pyr.groupBy("res").agg(
        F.count("*").alias("tiles"),
        F.sum("n_src").alias("n_src"),
        F.sum(F.crc32(F.concat_ws("|", F.col("cell").cast("string"),
                                  F.sha2(F.col("px"), 256))))
        .alias("ck"))
        .orderBy("res").collect())


def _min_of(thunk, passes=2):
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        n = thunk()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main(n=2_000_000, out_md="BENCH/PYRAMID.md"):
    spark = get_session("pyramid-demo")
    img = (spark.read.parquet(ensure_pyramid_images(spark, n))
           .withColumn("x", phash_x(F.col("phash")))
           .withColumn("y", phash_y(F.col("phash")))
           .withColumn("cell", C.cell_of_xy(F.col("x"), F.col("y"), RES)))
    img.limit(1000).count()  # warm the Python worker pool

    base = tempfile.mkdtemp(prefix="pyr_demo_")
    t = SnapshotLogTable(spark, os.path.join(base, "corpus"),
                         sort_cols=["cell"])
    t.overwrite(img)

    x0, x1, y0, y1 = REGION
    clo = int(C.cell_of_xy_np(__import__("numpy").array([x0 + 1.0]),
                              __import__("numpy").array([y0 + 1.0]), RES)[0])
    chi = int(C.cell_of_xy_np(__import__("numpy").array([x1 - 1.0]),
                              __import__("numpy").array([y1 - 1.0]), RES)[0])
    cell_where = [("cell", ">=", clo), ("cell", "<=", chi)]
    in_region = ((F.col("x") >= x0) & (F.col("x") < x1)
                 & (F.col("y") >= y0) & (F.col("y") < y1))

    # old pyramid = STORED state (a production stack reads it back, it
    # is not recomputed inside the repair), built once and parked on disk
    full_path = os.path.join(base, "pyramid_v1")
    build_pyramid(t.read(), RES, MIN_RES, PX).write.parquet(full_path)
    old = spark.read.parquet(full_path)
    n_tiles = old.count()

    # the new vintage: every region image re-captured under a new id.
    # The changelog is an INPUT in production (snaplog emits it) — park
    # it on disk too so the repair leg isn't charged for deriving it.
    corpus = t.read()
    ch_path = os.path.join(base, "changelog")
    deletes = corpus.filter(in_region)
    inserts = deletes.withColumn("image_id", F.col("image_id") + n)
    (inserts.withColumn("_change_type", F.lit("insert"))
     .unionByName(deletes.withColumn("_change_type", F.lit("delete")))
     .write.parquet(ch_path))
    changed = spark.read.parquet(ch_path)
    n_region = changed.count() // 2

    rep = skipping_report(t, cell_where)

    def repair():
        ch = spark.read.parquet(ch_path)
        ins = ch.filter(F.col("_change_type") == "insert") \
            .drop("_change_type")
        members = (t.read(where=cell_where)  # manifest-pruned read
                   .filter(~in_region)       # survivors of partial cells
                   .unionByName(ins))
        # emit="delta": the production write shape — only the recomputed
        # tiles come back (the writer overwrites the dirty cell ranges)
        return pyramid_update(spark.read.parquet(full_path), members, ch,
                              RES, MIN_RES, PX, emit="delta").count()

    def rebuild():
        v2 = t.read().filter(~in_region).unionByName(
            spark.read.parquet(ch_path)
            .filter(F.col("_change_type") == "insert")
            .drop("_change_type"))
        return build_pyramid(v2, RES, MIN_RES, PX).count()

    # interleaved min-of-2 per leg; caches cleared between passes so a
    # plan-identical rerun can't serve the previous pass's cached levels
    def timed(thunk):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cnt = thunk()
        return time.perf_counter() - t0, cnt

    w_rep, n_rep = timed(repair)
    w_reb, n_reb = timed(rebuild)
    w_rep = min(w_rep, timed(repair)[0])
    w_reb = min(w_reb, timed(rebuild)[0])

    # verification: maintained == rebuilt, per-level signatures
    spark.catalog.clearCache()
    ins = changed.filter(F.col("_change_type") == "insert") \
        .drop("_change_type")
    members = (t.read(where=cell_where).filter(~in_region)
               .unionByName(ins))
    upd = pyramid_update(old, members, changed, RES, MIN_RES, PX)
    v2 = corpus.filter(~in_region).unionByName(ins)
    reb = build_pyramid(v2, RES, MIN_RES, PX)
    sig_u, sig_r = _sig(upd), _sig(reb)
    equal = sig_u == sig_r

    dirty_cells = chi - clo + 1
    touched = sum((dirty_cells >> (2 * d)) or 1
                  for d in range(RES - MIN_RES + 1))
    lines = [
        "# Tile pyramid — full build vs regional incremental repair",
        "",
        f"{n:,} images, res {RES}→{MIN_RES} ({4**RES:,} base cells, "
        f"{n_tiles:,} tiles), {PX}×{PX} tiles, "
        f"local[{spark.sparkContext.defaultParallelism}]. Corpus in a "
        f"cell-sorted snaplog table ({rep['files_total']} files); old "
        "pyramid and changelog read back from parquet (stored state, as "
        "in production).",
        "",
        f"- regional vintage: {n_region:,} images (~{100*n_region/n:.1f}% "
        f"of corpus) re-captured inside a 1/64-area bbox = "
        f"{dirty_cells:,} dirty base cells (one Morton range)",
        f"- dirty-member read is manifest-pruned: "
        f"**{rep['files_read']}/{rep['files_total']} files, "
        f"{rep['rows_scanned']:,}/{rep['rows_total']:,} rows scanned**",
        f"- tiles recomputed (delta emitted): {n_rep:,} of {n_tiles:,} "
        f"({100*n_rep/n_tiles:.1f}%; arithmetic bound ≤{touched:,}) — "
        "the dirty subtree walk",
        f"- incremental repair wall (delta emit): **{w_rep:.1f} s** "
        f"(min-of-2 interleaved, caches cleared per pass)",
        f"- from-scratch rebuild wall: **{w_reb:.1f} s**",
        f"- maintained == rebuilt (per-level tiles, n_src, "
        f"crc32(cell, sha2(px))): {'**EQUAL**' if equal else '**MISMATCH**'}",
        "",
        "| level | tiles | n_src | checksums equal |",
        "|---|---|---|---|",
    ]
    for u, r in zip(sig_u, sig_r):
        lines.append(f"| res {u['res']} | {u['tiles']:,} | {u['n_src']:,} |"
                     f" {'yes' if u == r else 'NO'} |")
    lines += [
        "",
        "At this sandbox scale Spark stage overhead (~20 small stages in "
        "the repair DAG) is a large constant in both legs, so the wall "
        "ratio understates the scale win; the touched-data ratios above "
        "are what survive a 10^6× scale-up. Uniform (non-regional) churn "
        "is the honest counter-case: 1% uniform churn dirties ~30% of "
        "all base cells, every file intersects the dirty set, and a "
        "full rebuild is the right call — pyramid_update is for the "
        "vintage-shaped updates the reference actually ships.",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    assert equal, "maintained pyramid != rebuild"
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH/PYRAMID.md"
    main(n, out)
