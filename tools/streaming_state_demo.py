"""State-store comparison for the continuous near-dup path (r5 #6):
the same streaming_phash_near_dup job, same data, run once under the
default heap-backed HDFS state store and once under RocksDB, recording
wall, throughput, emitted pairs, and the state-store metrics Spark
reports per batch. Writes BENCH/STREAMING.md.

Why it matters at 10^12 rows: the stateful pairing keeps
(max_hamming+1) x N signature entries alive forever. HDFSBacked holds
every version of that map on the executor HEAP (maintenance thread
snapshots aside) — GC pressure grows with corpus size. RocksDB keeps
the working set in native memory + local SSD; heap stays flat. At demo
scale the two should match on correctness and be in the same
throughput band; the flat-heap property is the reason RocksDB is the
production recommendation, not a local[32] speedup.

Usage: python tools/streaming_state_demo.py [n_rows] [n_batches] [out_md]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from egp_crn_spark.session import get_session
from egp_crn_spark.streaming import (ROCKSDB_PROVIDER, state_store,
                                     streaming_phash_near_dup)

HDFS_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                 "HDFSBackedStateStoreProvider")


def make_batches(n_rows: int, n_batches: int, seed: int = 7):
    """Deterministic phash corpus with planted near-dup families: 10% of
    rows are 1-2 bit flips of an earlier row (cross-batch pairs)."""
    rng = np.random.default_rng(seed)
    sigs = rng.integers(0, 1 << 63, size=n_rows, dtype=np.int64)
    n_dup = n_rows // 10
    src = rng.integers(0, n_rows - n_dup, size=n_dup)
    for i, s in enumerate(src):
        bits = rng.integers(0, 64, size=int(rng.integers(1, 3)))
        v = int(sigs[s])
        for b in bits:
            v ^= 1 << int(b)
        sigs[n_rows - n_dup + i] = np.int64(v - (1 << 64) if v >= (1 << 63) else v)
    ids = np.arange(n_rows, dtype=np.int64)
    per = n_rows // n_batches
    return [pd.DataFrame({"image_id": ids[i * per:(i + 1) * per],
                          "phash": sigs[i * per:(i + 1) * per]})
            for i in range(n_batches)]


def run_provider(spark, provider: str, batches, tmp: str):
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    name = "sdemo_" + ("rocks" if "RocksDB" in provider else "hdfs")
    stream = spark.readStream.schema("image_id long, phash long").parquet(src)
    state_rows = mem_bytes = 0
    with state_store(spark, provider):
        q = (streaming_phash_near_dup(stream, max_hamming=2)
             .writeStream.outputMode("append").format("memory").queryName(name)
             .option("checkpointLocation", os.path.join(tmp, "ckpt")).start())
        t0 = time.time()
        for i, b in enumerate(batches):
            b.to_parquet(os.path.join(src, f"b{i}.parquet"))
            q.processAllAvailable()
            prog = q.lastProgress
            if prog and prog.get("stateOperators"):
                so = prog["stateOperators"][0]
                state_rows = so.get("numRowsTotal", 0)
                mem_bytes = so.get("memoryUsedBytes", 0)
        wall = time.time() - t0
        q.stop()
    pairs = spark.sql(f"select count(distinct a_id, b_id) c from {name}").first().c
    return {"wall": wall, "pairs": int(pairs), "state_rows": int(state_rows),
            "state_mem_mb": mem_bytes / 1e6}


def main(n_rows=200_000, n_batches=8, out_md="BENCH/STREAMING.md"):
    spark = get_session("streaming-state-demo", cores=32)
    batches = make_batches(n_rows, n_batches)
    results = {}
    for label, provider in [("hdfs", HDFS_PROVIDER), ("rocksdb", ROCKSDB_PROVIDER)]:
        tmp = tempfile.mkdtemp(prefix=f"sdemo_{label}_")
        try:
            results[label] = run_provider(spark, provider, batches, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    assert results["hdfs"]["pairs"] == results["rocksdb"]["pairs"], results

    md = ["# Streaming near-dup: state-store providers", "",
          f"streaming_phash_near_dup, {n_rows:,} rows in {n_batches} "
          "micro-batches, 10% planted near-dups (cross-batch), local[32].",
          "Same emitted pair set under both providers.", ""]
    md.append("| provider | wall (s) | rows/s | distinct pairs | state rows | state mem (MB) |")
    md.append("|---|---|---|---|---|---|")
    for label, r in results.items():
        md.append(f"| {label} | {r['wall']:.1f} | {n_rows / r['wall']:,.0f} | "
                  f"{r['pairs']:,} | {r['state_rows']:,} | {r['state_mem_mb']:.1f} |")
    md += ["",
           "RocksDB's memoryUsedBytes is native block-cache + memtable, not",
           "JVM heap; the HDFS provider's figure IS heap and grows with the",
           "corpus forever — the reason RocksDB is the production default",
           "for the continuous path (state >> heap at 10^12 rows).",
           "Tests: test_streaming_phash_near_dup_stream_equals_batch runs",
           "stream==batch under BOTH providers."]
    with open(out_md, "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH/STREAMING.md"
    main(n, b, out)
