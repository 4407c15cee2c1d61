"""End-to-end reference pipeline demo → BENCH/PIPELINE.md.

One run of the ENTIRE egp-crn workflow, composed in reference order over
a coherent ~190k-arc synthetic world, with sanity counts checked at
every stage:

  standardize → snap-to-network → topology validations (7) →
  meshblock (polygonize + deadend-within + BO-on-boundary) →
  conflation → restore deltas

This is the "a user of the reference could run every stage they run
today" demonstration: each stage consumes the previous stage's output,
nothing is driver-side, and the planted ground truth (snap candidates,
crossing stubs, missing/modified arcs) is recovered exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from egp_crn_spark.config import env_cpus  # noqa: E402
from egp_crn_spark.functions import geomexpr as GX  # noqa: E402
from egp_crn_spark.operators import meshblock as MB  # noqa: E402
from egp_crn_spark.operators.conflate import (  # noqa: E402
    classify_conflation,
    conflate_pairs_rect,
)
from egp_crn_spark.operators.deltas import ngd_deletions, restore_modified  # noqa: E402
from egp_crn_spark.operators.snap import snap_nodes  # noqa: E402
from egp_crn_spark.operators.standardize import standardize  # noqa: E402
from egp_crn_spark.operators.validate import (validate_release,  # noqa: E402
                                              validate_topology)
from egp_crn_spark.session import get_session  # noqa: E402
from egp_crn_spark.sources.tables import load_table, save_table  # noqa: E402

N = int(os.environ.get("SPARK_GRAFT_PIPE_N", "300"))  # N x N cells
S = 50.0
X0 = Y0 = 1000.0


def synth_world(spark):
    """Grid NRN roads + BO stubs: k%18==0 stubs snap to a grid node
    (endpoint offset 0.05 < prox 0.1), k%18==5 stubs cross a wall."""
    cols = ["segment_id", "segment_id_orig", "segment_type", "bo_new",
            "boundary", "ngd_uid", "structure_type", "vertices"]
    base = spark.range((N + 1) * N)
    i = (F.col("id") % (N + 1)).cast("double")
    j = F.expr(f"id div {N + 1}").cast("double")

    def road(sid_prefix, verts, n_offset):
        return base.select(
            F.concat(F.lit(sid_prefix), F.col("id")).alias("segment_id"),
            F.lpad(F.hex(F.col("id") + n_offset), 32, "0").alias("segment_id_orig"),
            F.lit("1").alias("segment_type"), F.lit("0").alias("bo_new"),
            F.lit("0").alias("boundary"), F.lit(None).cast("int").alias("ngd_uid"),
            F.lit(None).cast("string").alias("structure_type"),
            verts.alias("vertices"),
        )

    vert = road("v", F.array(F.array(X0 + i * S, Y0 + j * S),
                             F.array(X0 + i * S, Y0 + (j + 1) * S)), 0)
    horiz = road("h", F.array(F.array(X0 + j * S, Y0 + i * S),
                              F.array(X0 + (j + 1) * S, Y0 + i * S)), 10_000_000)

    cells = spark.range(N * N)
    ci = (F.col("id") % N).cast("double")
    cj = F.expr(f"id div {N}").cast("double")
    cls = F.pmod(F.col("id") * 2654435761, F.lit(18))
    cx, cy = X0 + ci * S, Y0 + cj * S

    def bo(prefix, cond, verts):
        return cells.filter(cond).select(
            F.concat(F.lit(prefix), F.col("id")).alias("segment_id"),
            F.lit("-1").alias("segment_id_orig"),
            F.lit("2").alias("segment_type"), F.lit("0").alias("bo_new"),
            F.lit("0").alias("boundary"),
            (F.col("id") + 1).cast("int").alias("ngd_uid"),
            F.lit("Unknown").alias("structure_type"),
            verts.alias("vertices"),
        )

    # snap stub: starts 0.05 off the cell's lower-left grid node, runs to
    # the cell interior — snap_nodes must pull the start onto the node
    snap_stub = bo("sn", cls == 0,
                   F.array(F.array(cx + 0.03, cy + 0.04),
                           F.array(cx + 0.6 * S, cy + 0.7 * S)))
    # crossing stub: straddles the cell's right wall → v303 + mb_v201
    cross_stub = bo("cx", (cls == 5) & (ci < N - 1),
                    F.array(F.array(cx + 0.6 * S, cy + 0.5 * S),
                            F.array(cx + 1.4 * S, cy + 0.5 * S)))
    world = vert.select(cols).unionByName(horiz.select(cols)) \
        .unionByName(snap_stub.select(cols)).unionByName(cross_stub.select(cols))
    n_snap = cells.filter(cls == 0).count()
    n_cross = cells.filter((cls == 5) & (ci < N - 1)).count()
    return world, n_snap, n_cross


def main() -> None:
    cpus = env_cpus()
    spark = get_session("pipeline-demo", cores=cpus)
    world, n_snap, n_cross = synth_world(spark)
    path = os.path.join(REPO, ".data", f"pipe_demo_v1_{N}")
    if not os.path.isdir(path):
        world.repartition(cpus * 4).write.mode("overwrite").parquet(path)
    raw = spark.read.parquet(path)
    n_raw = raw.count()

    stages: dict[str, float] = {}
    checks: dict[str, object] = {}

    def stage(name, fn):
        # every stage lambda MATERIALIZES its result (write or count) —
        # returning a lazy DataFrame would misattribute its compute to
        # whichever later action first touches it
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        print(name, stages[name], "s", flush=True)
        return out

    def cached(df):
        df = df.cache()
        df.count()
        return df

    # stage outputs are WRITTEN as layers and reloaded — the reference's
    # per-stage layer IO (helpers.py export), and the right call on a
    # cluster too: a long window/join lineage recomputes across later
    # shuffles even when cached, while a parquet layer scans clean
    def layer(name, df):
        p = os.path.join(REPO, ".data", f"pipe_layer_{name}")
        save_table(df, p)
        return load_table(spark, p)

    # 1) standardize (types coded from strings; BO ids are short strings
    #    → deterministically repaired)
    std = stage("standardize", lambda: layer("std", standardize(raw)))
    checks["arcs"] = std.count()

    # 2) snap-to-network: BO stub starts pulled onto NRN nodes
    snapped = stage("snap_nodes", lambda: layer("snapped", snap_nodes(std)))
    moved = snapped.filter(F.col("segment_type") == 2).select(
        GX.start_point(F.col("vertices")).alias("p")
    ).filter(
        (F.element_at("p", 1) % 50.0 == 0.0) & (F.element_at("p", 2) % 50.0 == 0.0)
    ).count()
    checks["snapped_onto_nodes"] = moved
    checks["expected_snaps"] = n_snap

    # 3) topology validations (crossing stubs flag v303 with their wall)
    topo = stage("validate_topology", lambda: cached(validate_topology(snapped)))
    v303 = topo.agg(F.sum("v303")).first()[0]
    checks["v303_flags"] = int(v303)
    checks["expected_v303"] = 2 * n_cross

    # 4) meshblock: polygonize + deadend-within + BO-on-boundary
    faces = stage("polygonize", lambda: cached(MB.polygonize_meshblock(
        snapped, tile_res=6)))
    checks["faces"] = faces.count()
    checks["expected_faces"] = N * N
    v201 = stage("mb_v201", lambda: cached(MB.mb_v201_deadend_within(
        snapped, faces)))
    checks["v201_flags"] = v201.count()
    # crossing stubs are within no face; snapped stubs are within exactly
    # one (their start vertex sits ON a shared corner — boundary counts)
    checks["expected_v201"] = n_cross

    # 5) conflation of faces against aligned 2x2-cell blocks → all valid
    bb = faces.select(
        F.monotonically_increasing_id().alias("crn_id"),
        GX.bbox(F.col("vertices")).alias("_b"),
    ).select("crn_id", F.col("_b.xmin").alias("xmin"), F.col("_b.ymin").alias("ymin"),
             F.col("_b.xmax").alias("xmax"), F.col("_b.ymax").alias("ymax"))
    m = N // 2
    blocks = spark.range(m * m).select(
        F.col("id").alias("ngd_id"),
        ((F.col("id") % m).cast("double") * 2 * S + X0).alias("xmin"),
        (F.expr(f"id div {m}").cast("double") * 2 * S + Y0).alias("ymin"),
        ((F.col("id") % m + 1).cast("double") * 2 * S + X0).alias("xmax"),
        ((F.expr(f"id div {m}") + 1).cast("double") * 2 * S + Y0).alias("ymax"),
    )

    def conflate():
        pairs = conflate_pairs_rect(bb, blocks, res=8, broadcast_ngd=True)
        _, _, metrics = classify_conflation(pairs, bb.select("crn_id"),
                                            blocks.select("ngd_id"))
        return metrics.first()
    mrow = stage("conflation", conflate)
    checks["conflation_invalid_total"] = int(mrow["invalid_total"])

    # 6) restore deltas: drop some BOs from "current" → flagged
    current = snapped.filter(~((F.col("ngd_uid") % 7 == 3) & (F.col("segment_type") == 2)))
    deleted = stage("deltas", lambda: ngd_deletions(current, snapped).count())
    checks["deleted_bos"] = deleted
    restore_flags = restore_modified(
        snapped.filter(F.col("segment_type") == 2).limit(0).unionByName(
            snapped.filter("segment_id like 'sn%'")).limit(2000),
        current, radius=0.01).count()
    checks["restore_modified_sample"] = restore_flags

    total = round(sum(stages.values()), 1)
    ok = (checks["snapped_onto_nodes"] == checks["expected_snaps"]
          and checks["v303_flags"] == checks["expected_v303"]
          and checks["faces"] == checks["expected_faces"]
          and checks["v201_flags"] == checks["expected_v201"]
          and checks["conflation_invalid_total"] == 0)
    print("checks", checks, "OK" if ok else "MISMATCH", flush=True)
    print("total", total, "s", flush=True)

    out = os.path.join(REPO, "BENCH", "PIPELINE.md")
    with open(out, "w") as f:
        f.write(f"""# End-to-end reference pipeline — {n_raw:,} arcs, local[{cpus}]

Generated by tools/pipeline_demo.py. The COMPLETE egp-crn workflow
composed in reference order over one synthetic world ({N}x{N} grid
roads + BO stubs), each stage consuming the previous stage's output.

| stage | wall s | check |
|---|---|---|
| standardize (types, domains, id repair) | {stages['standardize']} | {checks['arcs']:,} arcs standardized |
| snap-to-network | {stages['snap_nodes']} | {checks['snapped_onto_nodes']:,}/{checks['expected_snaps']:,} planted stubs snapped onto NRN nodes |
| topology validations (all 7) | {stages['validate_topology']} | v303 = {checks['v303_flags']:,} (expected {checks['expected_v303']:,}) |
| polygonize | {stages['polygonize']} | {checks['faces']:,}/{checks['expected_faces']:,} faces |
| meshblock deadend-within | {stages['mb_v201']} | {checks['v201_flags']:,}/{checks['expected_v201']:,} crossing stubs flagged |
| conflation | {stages['conflation']} | invalid_total = {checks['conflation_invalid_total']} (expected 0) |
| restore deltas | {stages['deltas']} | {checks['deleted_bos']:,} deleted BOs detected |

**Total {total} s — all stage checks {'PASS' if ok else 'FAIL'}.**

Timing caveat: single-run wall clocks on this shared VM vary ~±30%
between time windows (host steal); stage-to-stage RATIOS within one run
are meaningful, cross-round absolute comparisons should lean on
bench.py's min-over-trials numbers. Since round 6 every stage
materialization commits through the snapshot-log catalog emulation
(sources/snaplog.py) — measured +~0.25 s per commit and +~0.2 s per
read of fixed METADATA cost (manifest, footer counts, explicit file
list), the same shape as a real Iceberg commit: per-file, not
per-byte, so it vanishes against stages bigger than this demo's.

Notes: the snapped stubs start ON shared face-corner nodes after
snapping, so meshblock 201 exercises the boundary-inclusive `within`
(each stub is within exactly ONE face despite touching four). Every
stage is the same operator a driver-contract query or oracle covers;
this demo shows them composing on one dataset, reference-style.

Raw: {json.dumps({"stages": stages, "checks": {k: int(v) if not isinstance(v, str) else v for k, v in checks.items()}, "total_s": total})}
""")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    try:
        main()
    finally:
        validate_release()  # cache-hygiene contract: drop the last run's blocks
