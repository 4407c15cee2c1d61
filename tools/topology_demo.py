"""Half-million-arc topology-validation demo → BENCH/TOPOLOGY.md.

Runs the full validation suite (101/102/201/202/301/302/303) on a
~500k-arc network with PLANTED violations of every kind and exact
ground-truth counts:

- a W x H lattice of disjoint horizontal arcs (one per cell, all
  deadend-endpoint, none violating anything);
- per cell-hash class, one violation is planted: a self-crossing bowtie
  (101), a sub-tolerance vertex (102), an exact reversed duplicate
  (201), a collinear contained partner (202), a spur touching an
  interior vertex (301), a floating stub within min-distance (302), a
  proper crosser (303).

Planted geometry is chosen so classes do not interact except where the
semantics REQUIRE it (a 202 overlap partner is also a 302 violation:
it sits at distance 0 from an arc it shares no node with).
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
from egp_crn_spark.operators.validate import (validate_release,  # noqa: E402
                                              validate_topology)
from egp_crn_spark.session import get_session  # noqa: E402

W = int(os.environ.get("SPARK_GRAFT_TOPO_W", "800"))
H = int(os.environ.get("SPARK_GRAFT_TOPO_H", "600"))
SX, SY, X0, Y0 = 64.0, 16.0, 2000.0, 2000.0
CLASSES = {0: "v303", 1: "v202", 2: "v201", 3: "v102", 4: "v101",
           5: "v301", 6: "v302"}


def synth(spark, W=W, H=H):
    cells = spark.range(W * H)
    i = (F.col("id") % W).cast("double")
    j = F.expr(f"id div {W}").cast("double")
    cls = F.pmod(F.col("id") * 2654435761, F.lit(100))
    x0, y = X0 + i * SX, Y0 + j * SY
    sid = F.col("id").cast("string")

    def arcs(prefix, cond, vertices):
        return cells.filter(cond).select(
            F.concat(F.lit(prefix), sid).alias("segment_id"),
            vertices.alias("vertices"))

    pt = lambda a, b: F.array(a, b)  # noqa: E731
    base_plain = arcs("p", ~cls.isin(2, 3, 4, 5),
                      F.array(pt(x0, y), pt(x0 + 40.0, y)))
    base_v201 = arcs("a201_", cls == 2, F.array(pt(x0, y), pt(x0 + 40.0, y)))
    dup_v201 = arcs("b201_", cls == 2, F.array(pt(x0 + 40.0, y), pt(x0, y)))
    base_v102 = arcs("a102_", cls == 3,
                     F.array(pt(x0, y), pt(x0 + 0.005, y), pt(x0 + 40.0, y)))
    bow_v101 = arcs("a101_", cls == 4,
                    F.array(pt(x0, y), pt(x0 + 8.0, y + 6.0),
                            pt(x0 + 8.0, y), pt(x0, y + 6.0)))
    base_v301 = arcs("a301_", cls == 5,
                     F.array(pt(x0, y), pt(x0 + 20.0, y), pt(x0 + 40.0, y)))
    spur_v301 = arcs("b301_", cls == 5,
                     F.array(pt(x0 + 20.0, y), pt(x0 + 20.0, y + 8.0)))
    part_v202 = arcs("b202_", cls == 1,
                     F.array(pt(x0 + 10.0, y), pt(x0 + 30.0, y)))
    stub_v302 = arcs("b302_", cls == 6,
                     F.array(pt(x0 + 10.0, y + 3.0), pt(x0 + 10.0, y + 9.0)))
    cross_v303 = arcs("b303_", cls == 0,
                      F.array(pt(x0 + 20.0, y - 8.0), pt(x0 + 20.0, y + 8.0)))
    out = base_plain
    for df in (base_v201, dup_v201, base_v102, bow_v101, base_v301,
               spur_v301, part_v202, stub_v302, cross_v303):
        out = out.unionByName(df)
    counts = {name: cells.filter(cls == c).count() for c, name in CLASSES.items()}
    return out, counts


def prepare_scale(spark, cpus, w, h):
    """Synth (disk-cached) one lattice + its expected counts."""
    net, ncls = synth(spark, w, h)
    GEN_V = 1  # bump when synth geometry/classes change — cache key
    path = os.path.join(REPO, ".data", f"topo_demo_v{GEN_V}_{w}x{h}")
    if not os.path.isdir(path):
        net.repartition(cpus * 4).write.mode("overwrite").parquet(path)
    net = spark.read.parquet(path)
    expected = {
        "v101": ncls["v101"], "v102": ncls["v102"],
        "v201": 2 * ncls["v201"], "v202": 2 * ncls["v202"],
        "v301": ncls["v301"],
        "v302": 2 * ncls["v302"] + 2 * ncls["v202"],
        "v303": 2 * ncls["v303"],
    }
    return {"net": net, "n_arcs": net.count(), "expected": expected,
            "w": w, "h": h, "wall": float("inf")}


def composed_trial(pt):
    """One composed run over pt["net"]; keeps the min wall and counts.
    A fresh validate_topology() DataFrame per trial (no shuffle reuse)."""
    t0 = time.perf_counter()
    flagged = validate_topology(pt["net"])
    agg = flagged.agg(*[F.sum(f"v{c}").alias(f"v{c}")
                        for c in (101, 102, 201, 202, 301, 302, 303)]).first()
    pt["wall"] = min(pt["wall"], time.perf_counter() - t0)
    pt["got"] = {f"v{c}": int(agg[f"v{c}"]) for c in (101, 102, 201, 202, 301, 302, 303)}
    pt["ok"] = pt["got"] == pt["expected"]


def stage_walls(pt):
    """Per-validation walls (each run standalone over the cached arcs) so
    the NEXT optimization targets the measured top stage, not a guess.
    Sum exceeds the composed wall: stages share the normalized-arc cache
    but rerun their own candidate pipelines here."""
    from egp_crn_spark.operators.validate import VALIDATIONS

    w, h = pt["w"], pt["h"]
    cached = pt["net"].cache()
    cached.count()
    stages = {}
    for code in sorted(VALIDATIONS):
        t0 = time.perf_counter()
        VALIDATIONS[code](cached).count()
        stages[f"v{code}"] = round(time.perf_counter() - t0, 1)
    cached.unpersist()
    pt["stages"] = stages
    print(f"[{w}x{h}] expected", pt["expected"], flush=True)
    print(f"[{w}x{h}] got     ", pt["got"],
          "MATCH" if pt["ok"] else "MISMATCH", flush=True)
    print(f"[{w}x{h}] wall {pt['wall']:.1f}s  arcs/s {pt['n_arcs'] / pt['wall']:,.0f}", flush=True)
    print(f"[{w}x{h}] stages", stages, flush=True)


def main() -> None:
    cpus = env_cpus()
    spark = get_session("topology-demo", cores=cpus)
    # base point (round-over-round comparable) + a 4x scale-up point:
    # same planted geometry, the lattice just grows southward (the
    # domain caps x; H*4 stays inside it). Composed trials INTERLEAVE
    # across the two scales (base, big, base, big) so a host-steal burst
    # degrades both points equally instead of silently skewing the
    # per-arc scale-up ratio — the number the 100x story rests on.
    base = prepare_scale(spark, cpus, W, H)
    big = prepare_scale(spark, cpus, W, H * 4)
    for _ in range(2):
        composed_trial(base)
        composed_trial(big)
    stage_walls(base)
    stage_walls(big)
    n_arcs, wall = base["n_arcs"], base["wall"]
    expected, got, ok = base["expected"], base["got"], base["ok"]
    scaleup = round((big["wall"] / wall) / (big["n_arcs"] / n_arcs), 2)

    out = os.path.join(REPO, "BENCH", "TOPOLOGY.md")
    with open(out, "w") as f:
        f.write(f"""# Topology validations at scale — {n_arcs:,} arcs, local[{cpus}]

Generated by tools/topology_demo.py. All SEVEN validations
(101 simple / 102 cluster-tolerance / 201 duplicated / 202 overlap /
301 node-intersection / 302 min-distance / 303 crosses) composed via
`validate_topology()` over one {W}x{H} lattice network with planted
violations and exact expected counts.

Wall clock for the full composed suite: **{wall:.1f} s**
({n_arcs / wall:,.0f} arcs/s through 7 validations).

| validation | planted (expected flags) | flagged | match |
|---|---|---|---|
""")
        for k in sorted(expected):
            f.write(f"| {k} | {expected[k]:,} | {got[k]:,} | "
                    f"{'yes' if got[k] == expected[k] else 'NO'} |\n")
        f.write(f"""
All counts {"match" if ok else "MISMATCH — see raw"} the planted ground
truth, including the required interaction (a 202 overlap partner is also
a 302 violation: distance 0 from an arc it shares no node with).

Per-validation walls, each run standalone over the cached arc set (sums
exceed the composed wall — stages rerun their own candidate pipelines
when timed apart; single-stage walls on this shared VM carry ±30% steal
noise, so read the TABLE for ranking, not ulp-level deltas — a stage
reading faster at 4x the arcs is warm-up/steal, not magic):

| stage | {n_arcs:,} arcs (s) | {big['n_arcs']:,} arcs (s) |
|---|---|---|
""")
        for k in sorted(base["stages"]):
            f.write(f"| {k} | {base['stages'][k]} | {big['stages'][k]} |\n")
        f.write(f"""

Scale-up point (same session, same planted geometry, 4x the cells):
**{big['n_arcs']:,} arcs in {big['wall']:.1f} s**
({big['n_arcs'] / big['wall']:,.0f} arcs/s; counts
{"all exact" if big['ok'] else "MISMATCH"}). Time grew
{scaleup}x per-arc relative to the base point — near-linear in input,
no quadratic candidate blowup, which is the property that matters at
100x.

Plan shapes at this scale: 201 is one checksum aggregation; 202/303 are
COLUMN-PRUNED bbox-cell self-joins (ids + endpoints + bbox, never vertex
arrays) whose single-segment pairs — the bulk of a noded network —
resolve with pure-Column predicates, multi-vertex pairs refining in an
Arrow kernel fed by per-arc array join-backs; 301 is relational over
exploded vertices; 302 is the dilated-bbox point-to-segment join minus
the connected set — segments cover their radius-dilated bbox cells so
deadend points carry ONE cell each (no k-ring explode), the source-arc
id is the point id (nothing else rides the candidate shuffle), the
connectivity join is restricted to deadend arcs with no pre-distinct on
the vertex side, and BOTH deadend sides broadcast when the measured
deadend count is small (bound-enforced; this all-deadend lattice takes
the shuffle fallback); 101 is
a per-row Arrow kernel; 102 is pure Column. No stage collects to the
driver; every shuffle keys on bigints or node-key strings.

Raw: {json.dumps({"expected": expected, "got": got, "wall_s": round(wall, 1), "n_arcs": n_arcs, "stages": base["stages"], "scaleup": {"n_arcs": big["n_arcs"], "wall_s": round(big["wall"], 1), "ok": big["ok"], "per_arc_ratio": scaleup, "stages": big["stages"]}})}
""")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    try:
        main()
    finally:
        validate_release()  # cache-hygiene contract: drop the last run's blocks
