"""Dataset assembly for training pipelines: deterministic splits,
stratified sampling, and sequence packing.

The last mile of a training-data pipeline — after dedup/quality/ANN
filtering, the surviving corpus must be split, balanced, and packed into
fixed-token chunks. All three operators here are DETERMINISTIC functions
of (row identity, seed): re-running on the same corpus yields the same
assignment regardless of partitioning, cluster size, or row order —
the property that makes splits auditable and resumable at 100 TB.
`df.sample()` / `randomSplit()` deliberately do NOT have it (they sample
per-partition with partition-seeded RNGs, so a repartition reshuffles
membership).

Scale shapes:
- hash_split / stratified_sample: pure Column expressions / one shuffle.
- pack_chunks: a distributed prefix sum — range-partition by the hash
  order, partition-local cumsum (parallel window), and a driver-side
  offset table of ONE row per partition (metadata-sized). Chunk ids
  depend only on the global order and token counts, not on where the
  sampled range boundaries fall, so the result is stable across
  partitioning layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKETS = 1_000_000


def hash_split(df: DataFrame, weights: dict[str, float],
               id_col: str = "doc_id", seed: int = 7,
               split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split: each row's bucket =
    xxhash64(seed, id) mod 1e6, thresholded by cumulative weights.
    Membership is a pure function of (id, seed) — stable under
    repartition, append-only growth, and re-runs (new rows never move
    old rows between splits, unlike randomSplit)."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("hash_split needs positive weights")
    bucket = F.pmod(F.xxhash64(F.lit(seed), F.col(id_col)),
                    F.lit(_BUCKETS))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, last)


def stratified_sample(df: DataFrame, strata: list[str], n_per_stratum: int,
                      id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """EXACTLY min(n, stratum size) rows per stratum, chosen by hash
    order — deterministic and unbiased for ordered corpora (the first n
    ids of a time-ordered table are not a representative slice; a hash
    order is — same rationale as similarity.train_centroids). One
    shuffle (the window partition)."""
    w = Window.partitionBy(*strata).orderBy(
        F.xxhash64(F.lit(seed), F.col(id_col)), F.col(id_col))
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n_per_stratum).drop("_rk"))


def pack_chunks(df: DataFrame, token_col: str, chunk_tokens: int,
                id_col: str = "doc_id", seed: int = 7,
                num_partitions: int | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    deterministic hash order and cut into fixed-size token chunks;
    each doc is assigned (chunk_id, chunk_offset) of its START token —
    the standard "concatenate the corpus, split every N tokens" packing
    of LLM pretraining, as a distributed prefix sum:

      1. range-partition by the hash order (clusters the order without
         a global sort bottleneck);
      2. partition-local running sum via a window (parallel — one
         window per partition, not one global partition);
      3. add per-partition offsets from a driver-side table of one row
         per partition (metadata-sized collect).

    Chunk ids are a function of the global order + token counts only;
    sampled range boundaries shifting between runs cannot change them.
    Rows with token_count <= 0 raise (a silent 0 would misalign every
    later offset)."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ordered = (
        df.withColumn("_ord", F.xxhash64(F.lit(seed), F.col(id_col)))
        .repartitionByRange(n, F.col("_ord"), F.col(id_col))
    )
    ordered = ordered.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy("_ord", id_col)
    local = ordered.withColumn("_cum", F.sum(token_col).over(w))

    psums = local.groupBy("_pid").agg(F.max("_cum").alias("_t")).collect()
    if any(r["_t"] is None for r in psums):
        raise ValueError(f"pack_chunks: null {token_col}")
    offsets = {}
    acc = 0
    for r in sorted(psums, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_t"]
    off = F.create_map(*[x for pid, o in offsets.items()
                         for x in (F.lit(pid), F.lit(o))])
    # the assert folds INTO the start expression (null when passing) so
    # column pruning can never elide it
    guard = F.assert_true(
        F.col(token_col) > 0,
        F.concat(F.lit("pack_chunks: non-positive token count for id "),
                 F.col(id_col).cast("string")))
    start = (off[F.col("_pid")] + F.col("_cum") - F.col(token_col)
             + F.coalesce(guard.cast("long"), F.lit(0)))
    return (
        local.withColumn("_start", start)
        .withColumn("chunk_id", (F.col("_start") / chunk_tokens).cast("long"))
        .withColumn("chunk_offset",
                    F.pmod(F.col("_start"), F.lit(chunk_tokens)))
        .drop("_ord", "_pid", "_cum", "_start")
    )
