"""Two-parallelism-level scaling bench → BENCH/BASELINE.md.

The north rule's N→4N executor scaling criterion cannot use a real
cluster in this sandbox; per driver instruction we evidence it by running
the SAME jobs at local[8] and local[32] on IDENTICAL input and reporting
throughput at both plus scaling efficiency = (T_32 / T_8) / 4 (T in
rows/sec).

Methodology (this box is a shared, noisy VM — ~18% historical steal):
- trials at the two levels are INTERLEAVED across alternating
  subprocesses (8, 32, 8, 32, ...) so drift hits both levels equally;
- each subprocess times fresh DataFrames per trial (Spark reuses shuffle
  map output across actions on a shared DataFrame object);
- min over trials = least-interference estimate;
- three jobs with different bottlenecks are reported separately:
  * tile_assign  — pure-JVM scan+agg (memory-bandwidth-bound: a single
    JVM cannot add bandwidth with threads the way a real 4× executor
    scale-out adds sockets; treat its efficiency as a lower bound),
  * pip_images   — hybrid JVM join + Arrow scalar-UDF refine,
  * refine_kernel — Python-compute-bound pandas-UDF kernel (the fleet's
    per-core work; closest proxy for executor scale-out).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "scaling_worker.py")


def run_worker(cpus: int, n_images: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_N_IMAGES=str(n_images))
    out = subprocess.run([sys.executable, WORKER], env=env,
                         capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", "20000000"))
    rounds = int(os.environ.get("SPARK_GRAFT_ROUNDS", "3"))
    lo, hi = 8, 32
    best: dict[int, dict[str, float]] = {lo: {}, hi: {}}
    job_rows: dict[str, int] = {}
    for _ in range(rounds):
        for cpus in (lo, hi):
            r = run_worker(cpus, n_images)
            job_rows.update(r.get("rows", {}))
            for job, sec in r["secs"].items():
                cur = best[cpus].get(job)
                best[cpus][job] = sec if cur is None else min(cur, sec)

    jobs = {
        "tile_assign": ("tile assignment (phash→cell/tile, pure JVM scan+agg, 4×20M rows)",
                        "memory-bandwidth-bound in one JVM"),
        "pip_images": ("point-in-polygon join (cell prefilter + scalar-UDF refine)",
                       "hybrid JVM + Arrow"),
        "refine_kernel": ("exact-PIP refine kernel (Python-compute-bound pandas UDF)",
                          "per-core compute; closest executor-scale-out proxy"),
        "ivf_assign": ("IVF centroid assignment (broadcast-matmul mapInArrow, float32, 1M×64-dim, 64 cells)",
                       "Arrow-buffer/memory-bandwidth-bound (vectors stream through one "
                       "bus; BLAS pinned to 1 thread/worker — see session.py): "
                       "treat like tile_assign as a lower bound"),
    }
    rows = []
    for job, (label, note) in jobs.items():
        n = job_rows.get(job, n_images)
        t_lo = n / best[lo][job]
        t_hi = n / best[hi][job]
        eff = (t_hi / t_lo) / (hi / lo)
        rows.append((label, note, t_lo, t_hi, eff))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(path, "w") as f:
        f.write(f"""# BENCH baseline — two-parallelism-level scaling evidence

Generated {stamp} by tools/scaling_bench.py. Sandbox proxy for the
N→4N-executor criterion (BASELINE.json north_rule): the same jobs run at
`local[{lo}]` and `local[{hi}]` on identical input ({n_images:,} synthetic
image rows), single JVM. Trials interleaved across alternating
subprocesses, min-of-{rounds} per level (shared noisy VM, ~18% historical
CPU steal in /proc/stat).

| job | rows/sec @ local[{lo}] | rows/sec @ local[{hi}] | speedup | efficiency (target ≥0.8) |
|---|---|---|---|---|
""")
        for label, note, t_lo, t_hi, eff in rows:
            f.write(f"| {label} | {t_lo:,.0f} | {t_hi:,.0f} | {t_hi / t_lo:.2f}× | {eff:.2f} |\n")
        f.write("""
Reading the numbers:
- Efficiency = (T_hi/T_lo) / (32/8), T in rows/sec.
- `local[N]` scales THREADS in one JVM sharing one memory bus and one
  NVMe: bandwidth-bound stages (parquet decode, hash agg) hit the bus
  ceiling well before 32 threads, so their thread-scaling efficiency is a
  LOWER bound on executor-scaling efficiency — a real 4× executor
  scale-out multiplies sockets, memory channels, and disks, which is
  exactly what these stages need. The Python-compute-bound kernel is the
  closest sandbox proxy for that regime.
- Raw-CPU control on this box: a multiprocessing busy-loop scales 8→32
  workers at ~0.90 efficiency, bounding what any framework can show here.
""")
        f.write("\nPer-job wall seconds (min over interleaved trials):\n\n")
        f.write(f"| job | local[{lo}] s | local[{hi}] s |\n|---|---|---|\n")
        for job in jobs:
            f.write(f"| {job} | {best[lo][job]:.2f} | {best[hi][job]:.2f} |\n")
    print(json.dumps({"best": best,
                      "efficiency": {j: r[4] for j, r in zip(jobs, rows)}}))
    print("wrote", path)


if __name__ == "__main__":
    main()
