"""Two-parallelism-level scaling bench → BENCH/BASELINE.md.

The north rule's N→4N executor scaling criterion cannot use a real
cluster in this sandbox; per driver instruction we evidence it by running
the SAME job at local[8] and local[32] on IDENTICAL input and reporting
throughput at both plus scaling efficiency = (T_32 / T_8) / 4 (T in
rows/sec).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_TRIALS=os.environ.get("SPARK_GRAFT_TRIALS", "3"),
               SPARK_GRAFT_N_IMAGES=os.environ.get("SPARK_GRAFT_N_IMAGES", "2000000"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    r_lo = run_bench(lo, sf_dir)
    r_hi = run_bench(hi, sf_dir)

    def eff(key: str) -> tuple[float, float, float]:
        t_lo, t_hi = r_lo[key], r_hi[key]
        return t_lo, t_hi, (t_hi / t_lo) / (hi / lo)

    ta = eff("rows_per_sec_tile_assign")
    pp = eff("rows_per_sec_pip")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(path, "w") as f:
        f.write(f"""# BENCH baseline — two-parallelism-level scaling evidence

Generated {stamp} by tools/scaling_bench.py. Sandbox proxy for the
N→4N-executor criterion (BASELINE.json north_rule): the same job run at
`local[{lo}]` and `local[{hi}]` on identical input
({r_lo['n_images']:,} synthetic image rows derived from {sf_dir}),
single JVM, parallelism = executor-thread count.

| job | rows/sec @ local[{lo}] | rows/sec @ local[{hi}] | speedup | scaling efficiency (target ≥0.8) |
|---|---|---|---|---|
| tile assignment (phash→cell/tile, pure Catalyst) | {ta[0]:,.0f} | {ta[1]:,.0f} | {ta[1]/ta[0]:.2f}× | {ta[2]:.2f} |
| point-in-polygon join (cell prefilter + numpy refine) | {pp[0]:,.0f} | {pp[1]:,.0f} | {pp[1]/pp[0]:.2f}× | {pp[2]:.2f} |

Full per-query wall times (sec):

| query | local[{lo}] | local[{hi}] |
|---|---|---|
""")
        for q in r_lo["queries"]:
            f.write(f"| {q} | {r_lo['queries'][q]} | {r_hi['queries'][q]} |\n")
        f.write(f"""
Notes:
- Efficiency = (T_{hi}/T_{lo}) / ({hi}/{lo}), T in rows/sec.
- local-mode caveat: both levels share one JVM and one NVMe; shuffle is
  through local disk, so the 4× thread scaling underestimates what a real
  4× executor scale-out (with 4× aggregate memory bandwidth + disks)
  would deliver on short queries whose fixed costs (session, parquet
  footer reads, Python worker fork) don't shrink with cores.
""")
    print(json.dumps({"tile_assign_eff": ta[2], "pip_eff": pp[2],
                      "lo": r_lo, "hi": r_hi}))
    print("wrote", path)


if __name__ == "__main__":
    main()
