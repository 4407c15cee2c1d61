"""Checkpoint-resume across the composed pipeline → BENCH/RESUME.md.

BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics" — this demo turns that claim into an end-to-end,
killed-and-restarted run:

  1. a worker process runs the 6-stage pipeline with a per-stage
     CheckpointedRun, is KILLED after committing stage 3, and killed
     AGAIN mid-stage-4 having committed only half of stage 4's
     partitions (row-local stage → partition-level resume is exact);
  2. the resume run finds stages 1–3 complete via the lineage anti-join
     (remaining() returns zero partitions — zero recompute), finishes
     only stage 4's missing partitions, and runs stages 5–6;
  3. a fresh, checkpoint-free run of the same pipeline produces the
     ground truth; the resumed outputs must match it EXACTLY
     (per-partition row counts + order-insensitive checksums).

Reference parity: the reference resumes by region — ~140 working areas
(src/config.yaml:23-160) with skip-if-exists gates
(gen_crossings.py:76-92); here the same idea is partition-granular and
checksum-verified (operators/lineage.py).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from egp_crn_spark.config import env_cpus  # noqa: E402
from egp_crn_spark.functions import cells as C  # noqa: E402
from egp_crn_spark.functions import geomexpr as GX  # noqa: E402
from egp_crn_spark.operators import meshblock as MB  # noqa: E402
from egp_crn_spark.operators.lineage import CheckpointedRun, partition_lineage  # noqa: E402
from egp_crn_spark.operators.snap import snap_nodes  # noqa: E402
from egp_crn_spark.operators.standardize import standardize  # noqa: E402
from egp_crn_spark.operators.validate import validate_topology  # noqa: E402
from egp_crn_spark.session import get_session  # noqa: E402

N = int(os.environ.get("SPARK_GRAFT_RESUME_N", "120"))
TILE_RES = 6  # ~36 occupied tiles over the 120x120 world → real partitions
OUT = os.path.join(REPO, ".data", "resume_demo")
VCODES = (101, 102, 201, 303)  # row-local + pair validations (fast subset)


def with_cell(df):
    first = F.element_at(F.col("vertices"), 1)
    return df.withColumn(
        "cell_id",
        C.cell_of_xy(F.element_at(first, 1), F.element_at(first, 2), TILE_RES),
    )


def build_world(spark):
    os.environ["SPARK_GRAFT_PIPE_N"] = str(N)  # before pipeline_demo import
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pipeline_demo import synth_world

    world, _, _ = synth_world(spark)
    path = os.path.join(REPO, ".data", f"resume_world_v1_{N}")
    if not os.path.isdir(path):
        world.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# ---------------------------------------------------------------- stages
def stage_defs(spark, raw):
    """Each entry: (name, input_fn, transform). input_fn reads the
    PREVIOUS stage's committed output (or raw), so a skipped stage costs
    one lineage read — its compute lineage is never touched."""
    def out(k):
        return CheckpointedRun(spark, os.path.join(OUT, f"s{k}"))

    runs = {k: out(k) for k in range(1, 7)}

    def s1_in():
        return with_cell(raw)

    def s2_in():
        return runs[1].output()

    def s3_in():
        return runs[2].output()

    def s4_in():
        return runs[3].output()

    def s5_in():
        # polygonize consumes the flagged ARCS (stage 3), not the
        # metrics table — stages 4 and 5 branch off stage 3
        return runs[3].output()

    def s6_in():
        return runs[5].output()

    def s5_tx(df):
        faces = MB.polygonize_meshblock(df.drop("cell_id"), tile_res=6)
        return faces.withColumn(
            "cell_id", C.parent_cell(F.col("tile"), 6, TILE_RES)
        ).select("cell_id", "face_id", "area")

    return runs, [
        ("standardize", s1_in, lambda df: with_cell(standardize(df.drop("cell_id")))),
        ("snap_nodes", s2_in, lambda df: with_cell(snap_nodes(df.drop("cell_id")))),
        ("validate_topology", s3_in,
         lambda df: with_cell(validate_topology(df.drop("cell_id"), codes=list(VCODES)))),
        # stage 4 is ROW-LOCAL → partition-level resume is exact
        ("arc_metrics", s4_in, lambda df: df.select(
            "cell_id", "segment_id",
            GX.line_length(F.col("vertices")).alias("length"),
            sum((F.col(f"v{c}") for c in VCODES), F.lit(0)).alias("n_flags"),
        )),
        ("polygonize", s5_in, s5_tx),
        ("rollup", s6_in, lambda df: df.groupBy("cell_id").agg(
            F.count("*").alias("n_faces"),
            F.round(F.sum("area"), 6).alias("total_area"),
        )),
    ]


def worker(kill_mode: str) -> None:
    """kill_mode: 'kill' = die after stage 3 + half of stage 4;
    'resume' = run everything, reporting skips."""
    spark = get_session("resume-demo", cores=env_cpus())
    raw = build_world(spark)
    runs, stages = stage_defs(spark, raw)
    report = []
    for k, (name, input_fn, transform) in enumerate(stages, start=1):
        t0 = time.perf_counter()
        todo = runs[k].remaining(input_fn())
        n_todo = todo.count()
        if n_todo == 0:
            report.append({"stage": name, "skipped": True,
                           "wall_s": round(time.perf_counter() - t0, 2)})
            print(f"SKIP {name} (lineage complete)", flush=True)
            continue
        if kill_mode == "kill" and k == 4:
            # simulate a crash mid-stage: commit only half the partitions
            half = todo.filter(F.pmod(F.xxhash64("cell_id"), F.lit(2)) == 0)
            runs[k].commit(transform(half))
            print("KILLED mid-stage-4 (half committed)", flush=True)
            spark.stop()
            sys.exit(17)
        runs[k].commit(transform(todo))
        report.append({"stage": name, "skipped": False, "rows_in": n_todo,
                       "wall_s": round(time.perf_counter() - t0, 2)})
        print(f"RAN  {name} ({n_todo} rows in, "
              f"{report[-1]['wall_s']}s)", flush=True)
    bad = sum(runs[k].verify().count() for k in runs)
    print(json.dumps({"report": report, "verify_mismatches": bad}), flush=True)
    spark.stop()


def fresh_truth(spark, raw):
    """The same pipeline with NO checkpointing — ground truth."""
    std = standardize(raw)
    snapped = snap_nodes(std)
    flagged = validate_topology(snapped, codes=list(VCODES))
    metrics = with_cell(flagged).select(
        "cell_id", "segment_id",
        GX.line_length(F.col("vertices")).alias("length"),
        sum((F.col(f"v{c}") for c in VCODES), F.lit(0)).alias("n_flags"),
    )
    faces = MB.polygonize_meshblock(snapped, tile_res=6).withColumn(
        "cell_id", C.parent_cell(F.col("tile"), 6, TILE_RES)
    ).select("cell_id", "face_id", "area")
    rollup = faces.groupBy("cell_id").agg(
        F.count("*").alias("n_faces"),
        F.round(F.sum("area"), 6).alias("total_area"),
    )
    return metrics, rollup


def main() -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    me = os.path.abspath(__file__)
    t0 = time.perf_counter()
    r1 = subprocess.run([sys.executable, me, "kill"], capture_output=True, text=True)
    t_kill = time.perf_counter() - t0
    assert r1.returncode == 17, f"kill run should exit 17: {r1.stdout[-2000:]}\n{r1.stderr[-2000:]}"
    t0 = time.perf_counter()
    r2 = subprocess.run([sys.executable, me, "resume"], capture_output=True, text=True)
    t_resume = time.perf_counter() - t0
    assert r2.returncode == 0, f"resume run failed: {r2.stdout[-2000:]}\n{r2.stderr[-2000:]}"
    resume_lines = [ln for ln in r2.stdout.splitlines() if ln.startswith(("SKIP", "RAN"))]
    summary = json.loads([ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1])

    # ground truth comparison
    spark = get_session("resume-verify", cores=env_cpus())
    raw = build_world(spark)
    t0 = time.perf_counter()
    metrics_t, rollup_t = fresh_truth(spark, raw)

    def lin(df):
        return {(r["cell_id"]): (r["row_count"], r["checksum"])
                for r in partition_lineage(df).collect()}

    truth4, truth6 = lin(metrics_t), lin(rollup_t)
    t_fresh = time.perf_counter() - t0
    # partitioned reads append cell_id last — re-select the canonical
    # column order so the lineage row hash is comparable
    got4 = lin(spark.read.parquet(os.path.join(OUT, "s4", "data"))
               .select("cell_id", "segment_id", "length", "n_flags"))
    got6 = lin(spark.read.parquet(os.path.join(OUT, "s6", "data"))
               .select("cell_id", "n_faces", "total_area"))
    identical = (truth4 == got4) and (truth6 == got6)
    skips = [ln for ln in resume_lines if ln.startswith("SKIP")]

    # ---- corruption detect + repair (verify-on-resume) ----
    # Flip ONE value in ONE committed stage-4 partition file (same row
    # count — only the content checksum can catch it), then show that
    # remaining(verify=True) reprocesses EXACTLY that partition and the
    # repaired output matches ground truth again. Hadoop's local-FS .crc
    # sidecar is dropped alongside (object stores have no sidecar — the
    # lineage checksum must be the detection layer).
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from egp_crn_spark.operators.lineage import CheckpointedRun

    runs, stages = stage_defs(spark, raw)
    _, s4_in, s4_tx = stages[3]
    run4 = runs[4]
    part = sorted(_glob.glob(os.path.join(OUT, "s4", "data", "cell_id=*", "*.parquet")))[0]
    cell = int(os.path.basename(os.path.dirname(part)).split("=")[1])
    t0 = time.perf_counter()
    pdf = pq.read_table(part).to_pandas()
    pdf.loc[0, "length"] = float(pdf.loc[0, "length"]) + 1.0
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), part + ".tmp")
    os.replace(part + ".tmp", part)
    crc = os.path.join(os.path.dirname(part), "." + os.path.basename(part) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    detected = sorted(r.cell_id for r in run4.verify().collect())
    n_cells4 = len(truth4)
    todo = run4.remaining(s4_in(), verify=True)
    todo_cells = sorted(r.cell_id for r in todo.select("cell_id").distinct().collect())
    run4.commit(s4_tx(todo))  # dynamic overwrite repairs just that partition
    repaired_clean = run4.verify().count() == 0
    got4r = lin(spark.read.parquet(os.path.join(OUT, "s4", "data"))
                .select("cell_id", "segment_id", "length", "n_flags"))
    t_corrupt = time.perf_counter() - t0
    corrupt_ok = (detected == [cell] and todo_cells == [cell]
                  and repaired_clean and got4r == truth4)

    ok = (identical and len(skips) == 3 and summary["verify_mismatches"] == 0
          and corrupt_ok)
    print("resume skips:", skips, flush=True)
    print("identical outputs:", identical, "OK" if ok else "MISMATCH", flush=True)
    print(f"corruption: cell {cell} detected={detected} reprocessed={todo_cells} "
          f"of {n_cells4} cells, repaired={repaired_clean}", flush=True)

    with open(os.path.join(REPO, "BENCH", "RESUME.md"), "w") as f:
        f.write(f"""# Checkpoint-resume across the composed pipeline

Generated by tools/resume_demo.py over the {N}x{N} pipeline world
({'{:,}'.format(raw.count())} arcs, local[{env_cpus()}]). Six stages, each a
`CheckpointedRun` (per-partition lineage rows: cell_id, row_count,
order-insensitive checksum).

**Run 1 (killed):** stages 1–3 committed, then the process was killed
mid-stage-4 with only HALF of stage 4's partitions committed
(exit 17, {t_kill:.1f}s).

**Run 2 (resume, {t_resume:.1f}s):** the lineage anti-join
(`remaining()`) found stages 1–3 complete — skipped with ZERO recompute
— and stage 4 resumed exactly its missing partitions:

```
{chr(10).join(resume_lines)}
```

**Verification:** a fresh, checkpoint-free run of the identical pipeline
({t_fresh:.1f}s) produced per-partition (row_count, checksum) lineage
IDENTICAL to the resumed outputs for both the stage-4 metrics table and
the stage-6 rollup: **{identical}**. `CheckpointedRun.verify()` found
{summary['verify_mismatches']} mismatching partitions across all six
stage outputs.

**Corruption detect + repair ({t_corrupt:.1f}s):** one value in one
committed stage-4 partition file was flipped in place (row count
unchanged — only the content checksum can see it; the local-FS .crc
sidecar was dropped to model an object store). `verify()` flagged
exactly cell {cell} out of {n_cells4}; `remaining(verify=True)`
returned exactly that partition's rows (a plain `remaining()` trusts
the lineage and returns none); one `commit()` dynamically overwrote
just that partition; the repaired table's full per-partition lineage
again matches ground truth: **{corrupt_ok}**.

Overall: **{'PASS' if ok else 'FAIL'}** — the north_rule's
"resumable from checkpoint with per-partition lineage + metrics" is
demonstrated end-to-end: a crashed run loses only the in-flight stage's
uncommitted partitions, a resumed run provably reproduces the
ground-truth outputs, and a corrupted committed partition is detected
and re-derived instead of trusted.

Raw: {json.dumps({"kill_s": round(t_kill, 1), "resume_s": round(t_resume, 1), "fresh_s": round(t_fresh, 1), "corrupt_s": round(t_corrupt, 1), "stages": summary["report"], "identical": identical, "corruption_repair": corrupt_ok})}
""")
    print("wrote BENCH/RESUME.md", flush=True)
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("kill", "resume"):
        worker(sys.argv[1])
    else:
        main()
