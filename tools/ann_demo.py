"""Million-vector ANN demo → BENCH/ANN.md.

Evidence for the similarity-search scale path: IVF coarse quantization
against the exact brute-force baseline on a 1M x 64-dim corpus generated
IN SPARK (deterministic per-dimension xxhash64 draws — no files, no
driver materialization). Reports wall time for both paths and recall@k
of IVF vs exact.
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
from egp_crn_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_assign,
    ivf_pq_assign,
    ivf_pq_probe,
    ivf_probe,
    train_centroids,
    train_pq,
)
from egp_crn_spark.session import get_session  # noqa: E402

N_VECS = int(os.environ.get("SPARK_GRAFT_ANN_VECS", "1000000"))
DIM = 64
K = 10
# (ncells, nprobe, training sample, dtype): the 64-cell point is the
# sandbox headline; the 1024-cell points evidence the broadcast-matmul
# quantizer at a production-shaped cell count (the literal-expression
# quantizer is infeasible there — a 1024 x 64 unrolled expression tree),
# in both precisions — float32 halves the Arrow/shuffle bytes of the
# bandwidth-bound build at zero recall cost.
IVF_CONFIGS = [(64, 8, 4096, "float64"), (1024, 32, 8192, "float64"),
               (1024, 32, 8192, "float32")]
N_QUERIES = 50
# synth_vectors defaults — echoed into the report header
N_CLUSTERS = 256
NOISE = 0.45
PQ_M = 16   # 64-dim / 16 subspaces: within-cluster resolution
PQ_REFINE = 32  # ADC finalists = k x 32 re-ranked exactly


from egp_crn_spark.synth import synth_vectors  # noqa: E402


def main() -> None:
    cpus = env_cpus()
    spark = get_session("ann-demo", cores=cpus)
    GEN_V = 2  # bump when synth_vectors changes — cache key
    path = os.path.join(REPO, ".data", f"ann_demo_v{GEN_V}_{N_VECS}")
    if not os.path.isdir(path):
        synth_vectors(spark, N_VECS).repartition(cpus * 4).write.mode(
            "overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    n = corpus.count()
    step = max(N_VECS // N_QUERIES, 1)
    queries = corpus.filter(F.col("vec_id") % step == 0).select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    ).cache()
    nq = queries.count()

    results: dict[str, dict] = {}

    def run(name, df):
        t0 = time.perf_counter()
        out = df.select("q_id", "n_id").cache()
        cnt = out.count()
        dt = time.perf_counter() - t0
        results[name] = {"rows": cnt, "sec": round(dt, 2),
                         "pair_throughput": round(nq * n / dt, 1)}
        print(name, results[name], flush=True)
        return out

    bf = run("brute_force", brute_force_topk(queries, corpus, k=K))

    ivf_rows = []
    for ncells, nprobe, sample, dtype in IVF_CONFIGS:
        t0 = time.perf_counter()
        C = train_centroids(corpus, ncells, sample=sample)
        train_s = time.perf_counter() - t0
        # IVF index build: assignment is O(corpus x ncells), paid once
        # and amortized across every future query batch — timed apart.
        # min-of-2 trials: this VM's steal comes in bursts, and a single
        # trial can read 2-4x slow (BENCH/PIPELINE.md methodology).
        build_s = float("inf")
        index = None
        for _ in range(2):
            if index is not None:
                index.unpersist()
            t0 = time.perf_counter()
            index = ivf_assign(corpus, C, dtype=dtype).cache()
            index.count()
            build_s = min(build_s, time.perf_counter() - t0)
        tag = f"ivf{ncells}_{dtype}"
        results[f"{tag}_build"] = {"sec": round(build_s, 2),
                                   "vectors_per_sec": round(n / build_s, 1)}
        print(f"{tag}_build", results[f"{tag}_build"], flush=True)
        ivf = run(f"{tag}_probe", ivf_probe(queries, index, C, k=K, nprobe=nprobe))
        hits = ivf.join(bf, ["q_id", "n_id"], "left_semi").count()
        ivf_rows.append({
            "ncells": ncells, "nprobe": nprobe, "dtype": dtype,
            "train_s": round(train_s, 1),
            "build": results[f"{tag}_build"], "probe": results[f"{tag}_probe"],
            "recall": hits / (nq * K),
        })
        index.unpersist()

    # ---------------- IVF-PQ: compressed index (VERDICT r6 #4) --------
    # At 10^12 rows the float32 vector payload is petabytes; PQ stores
    # PQ_M residual bytes per vector instead. Compare on-DISK parquet
    # sizes of the two index shapes (the honest metric — that is what a
    # bucketed serving table costs), ADC-only recall, and ADC + exact
    # refine recall.
    import shutil
    import subprocess

    pq_cfg = {"ncells": 1024, "nprobe": 32, "sample": 8192}
    t0 = time.perf_counter()
    C = train_centroids(corpus, pq_cfg["ncells"], sample=pq_cfg["sample"])
    B = train_pq(corpus, C, m=PQ_M)
    pq_train_s = time.perf_counter() - t0
    build_s = float("inf")
    pq_index = None
    for _ in range(2):
        if pq_index is not None:
            pq_index.unpersist()
        t0 = time.perf_counter()
        pq_index = ivf_pq_assign(corpus, C, B).cache()
        pq_index.count()
        build_s = min(build_s, time.perf_counter() - t0)
    results["ivf_pq_build"] = {"sec": round(build_s, 2),
                               "vectors_per_sec": round(n / build_s, 1)}
    print("ivf_pq_build", results["ivf_pq_build"], flush=True)

    def disk_bytes(df, name):
        p = os.path.join(REPO, ".data", f"ann_demo_idx_{name}")
        shutil.rmtree(p, ignore_errors=True)
        df.write.mode("overwrite").parquet(p)
        out = subprocess.run(["du", "-sb", p], capture_output=True, text=True)
        return int(out.stdout.split()[0])

    f32_index = ivf_assign(corpus, C, dtype="float32")
    size_f32 = disk_bytes(f32_index, "f32")
    size_pq = disk_bytes(pq_index, "pq")
    compression = size_f32 / size_pq

    adc = run("ivf_pq_adc_probe",
              ivf_pq_probe(queries, pq_index, C, B, k=K,
                           nprobe=pq_cfg["nprobe"], approx_ok=True))
    recall_adc = adc.join(bf, ["q_id", "n_id"], "left_semi").count() / (nq * K)
    ref = run("ivf_pq_refined_probe",
              ivf_pq_probe(queries, pq_index, C, B, k=K,
                           nprobe=pq_cfg["nprobe"], refine_corpus=corpus,
                           refine_mult=PQ_REFINE))
    recall_ref = ref.join(bf, ["q_id", "n_id"], "left_semi").count() / (nq * K)
    pq_index.unpersist()

    head = ivf_rows[0]
    recall = head["recall"]
    speedup = results["brute_force"]["sec"] / head["probe"]["sec"]
    NCELLS, NPROBE, train_s = head["ncells"], head["nprobe"], head["train_s"]

    out = os.path.join(REPO, "BENCH", "ANN.md")
    with open(out, "w") as f:
        f.write(f"""# Million-vector ANN demo — {n:,} x {DIM}-dim, local[{cpus}]

Generated by tools/ann_demo.py. {nq} queries, top-{K} by cosine.
Corpus: {N_CLUSTERS} latent clusters + {NOISE} uniform noise (real
embedding spaces are clustered; IVF on UNIFORM data degrades to
recall ~0.55 at this nprobe — coarse quantization needs geometry).
IVF: {NCELLS} cells (k-means on a seeded 4096-vector sample,
{train_s:.1f}s driver-side), nprobe={NPROBE}.

| path | wall s | (query x corpus) pairs/s | recall@{K} vs exact |
|---|---|---|---|
| brute force (exact) | {results['brute_force']['sec']} | {results['brute_force']['pair_throughput']:,.0f} | 1.000 |"""
                + "".join(
                    f"""
| IVF {r['ncells']}-cell {r['dtype']} index build (once) | {r['build']['sec']} | {r['build']['vectors_per_sec']:,.0f} vec/s | — |
| IVF {r['ncells']}-cell {r['dtype']} probe (nprobe={r['nprobe']}) | {r['probe']['sec']} | {r['probe']['pair_throughput']:,.0f} | {r['recall']:.3f} |"""
                    for r in ivf_rows
                )
                + f"""
| IVF-PQ 1024-cell m={PQ_M} index build (once) | {results['ivf_pq_build']['sec']} | {results['ivf_pq_build']['vectors_per_sec']:,.0f} vec/s | — |
| IVF-PQ ADC-only probe (nprobe={pq_cfg['nprobe']}) | {results['ivf_pq_adc_probe']['sec']} | {results['ivf_pq_adc_probe']['pair_throughput']:,.0f} | {recall_adc:.3f} |
| IVF-PQ ADC + exact refine (x{PQ_REFINE} finalists) | {results['ivf_pq_refined_probe']['sec']} | {results['ivf_pq_refined_probe']['pair_throughput']:,.0f} | {recall_ref:.3f} |

## IVF-PQ compressed index (similarity.ivf_pq_assign / ivf_pq_probe)

Product quantization stores each vector as {PQ_M} residual bytes (unit-
normalized against its coarse centroid, per-subspace 256-entry codebooks
trained on the same deterministic 4096-row sample). On disk as parquet:

| index shape | bytes | bytes/vector |
|---|---|---|
| float32 IVF index (n_id, cv, cell, _cn) | {size_f32:,} | {size_f32 / n:.1f} |
| PQ index (n_id, cell, {PQ_M} codes) | {size_pq:,} | {size_pq / n:.1f} |

**{compression:.1f}x smaller** (target >= 8x). Probe scores candidates by
asymmetric distance — per-query lookup tables T_m[c] = dot(q_m, cb_m[c])
built once per unique query per Arrow batch, then a zero-copy byte-gather
+ sum per candidate — and the refined path re-ranks the top
k x {PQ_REFINE} ADC finalists EXACTLY via an equi-join against the
uncompressed corpus (touching finalists only). Refined
recall@{K} = {recall_ref:.3f} at {compression:.0f}x compression (ADC-only
{recall_adc:.3f} — this corpus's true neighbours differ only in their
within-cluster residual, the hardest case for PQ; the exact-refine stage
is what restores recall, for ~{50 * K * PQ_REFINE:,} corpus-row lookups
per {nq}-query batch). m tunes the point: m=8 stores half the bytes at
refined recall ~0.73 (train_pq docstring tabulates the measured curve).
PQ is opt-in; the uncompressed probe path and the ivf_topk oracle are
unchanged.

Probe speedup {speedup:.1f}x vs brute force at recall {recall:.3f};
the O(corpus x ncells) index build amortizes across query batches.
The quantizer is the broadcast-centroid BLAS kernel (one X @ C.T per
Arrow record batch inside mapInArrow, similarity._assign_matmul;
the vector column passes through as the original Arrow buffers) — the
round-3 literal-expression quantizer built this index at ~28k vec/s
and could not express ncells=1024 at all.

Reading the numbers:
- Brute force is one broadcast cross join: queries broadcast, the corpus
  streams through a single whole-stage-codegen'd dot product per pair
  (norms hoisted per row — cosine costs ONE fold, not three). Exhaustive
  by design; its role is the recall oracle and the small-corpus path.
- IVF replaces the cross join with a cell equi-join against a prebuilt
  index (ivf_assign once; ivf_probe per batch): queries probe their
  {NPROBE} nearest cells, so the candidate set shrinks ~{NCELLS}/{NPROBE}x.
  On a real cluster the index would be WRITTEN bucketed by cell
  (sources/tables.save_bucketed_table), making the probe join
  shuffle-free on the corpus side.
- Both plans shuffle only on (cell, q_id)-style compact keys; the
  centroid matrix is an executor broadcast consumed by one BLAS matmul
  per Arrow batch (BLAS pinned to 1 thread/worker — parallelism belongs
  to the task scheduler, not library pools). Scaling the
  corpus 100x scales the IVF probe cost linearly in corpus size with the
  same ~{NCELLS}/{NPROBE}x candidate reduction; raise ncells with corpus
  size ("sqrt(N) cells" rule) to keep per-cell lists bounded.

Raw: {json.dumps(results)} recall={recall:.4f}
""")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
