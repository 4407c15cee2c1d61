"""Per-partition lineage + checkpoint-resumable runs.

BASELINE.json north_rule: runs must be resumable from checkpoint with
per-partition lineage rows (cell_id, row_count, checksum) — re-runs skip
completed partitions. The reference's analogue is its per-region
incremental processing (~140 working areas, src/config.yaml:23-160;
skip-if-exists gates like gen_crossings.py:76-92).

Pattern:
  todo = partitions(input) ANTI-JOIN completed(lineage)
  process(todo) → write partition → append lineage row
Idempotence: partition writes are overwrite-by-partition; lineage rows
carry an order-insensitive content checksum so a resumed run can verify
prior output instead of trusting it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "cell_id long, row_count long, checksum string, batch_id long"


def partition_lineage(df: DataFrame, cell_col: str = "cell_id") -> DataFrame:
    """(cell_id, row_count, checksum): checksum = xor-combined xxhash64 of
    each row's canonical string — order-insensitive (rows) AND
    column-order-insensitive: columns hash in sorted-by-name order, so
    the checksum of a partition read BACK from storage (where partition
    columns move last) reproduces the one recorded at commit time —
    the property verify-on-resume depends on."""
    row_hash = F.xxhash64(F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)]))
    return (
        df.withColumn("_h", row_hash)
        .groupBy(F.col(cell_col).alias("cell_id"))
        .agg(
            F.count("*").alias("row_count"),
            F.format_string(
                "%016x",
                F.aggregate(F.collect_list("_h"), F.lit(0).cast("long"),
                            lambda acc, h: acc.bitwiseXOR(h)),
            ).alias("checksum"),
        )
    )


def load_lineage(spark: SparkSession, path: str) -> DataFrame:
    if os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], LINEAGE_SCHEMA)


def remaining_partitions(df: DataFrame, lineage: DataFrame,
                         cell_col: str = "cell_id") -> DataFrame:
    """Rows of df whose partition is NOT recorded complete — the resume
    anti-join."""
    done = lineage.select(F.col("cell_id").alias(cell_col)).distinct()
    return df.join(F.broadcast(done), cell_col, "left_anti")


class CheckpointedRun:
    """Drive a partitioned computation resumably.

    >>> run = CheckpointedRun(spark, out_dir)
    >>> todo = run.remaining(input_df_with_cell_id)
    >>> result = transform(todo)
    >>> run.commit(result)          # writes partitions + lineage rows

    A killed run leaves committed partitions + lineage; the next run's
    ``remaining`` skips them. Output is parquet partitioned by cell_id
    (partition-overwrite semantics keep commits idempotent).
    """

    def __init__(self, spark: SparkSession, out_dir: str, cell_col: str = "cell_id"):
        self.spark = spark
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.lineage_dir = os.path.join(out_dir, "lineage")
        self.cell_col = cell_col
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def lineage(self) -> DataFrame:
        return load_lineage(self.spark, self.lineage_dir)

    def remaining(self, df: DataFrame, verify: bool = False) -> DataFrame:
        """Rows of df in partitions not yet complete. With verify=True a
        claimed-complete partition only counts as done if its STORED
        bytes still reproduce the recorded (row_count, checksum) — a
        corrupted or tampered partition is returned for reprocessing
        instead of trusted (the docstring promise of this module)."""
        lineage = self.lineage()
        if verify:
            bad = self.verify().select(F.col("cell_id"))
            lineage = lineage.join(bad, "cell_id", "left_anti")
        return remaining_partitions(df, lineage, self.cell_col)

    def commit(self, result: DataFrame) -> None:
        """Write result partitions + their lineage rows atomically-enough:
        data first, lineage last (a crash between the two re-processes the
        partition — idempotent by dynamic partition overwrite)."""
        result = result.cache()
        (
            result.repartition(self.cell_col)
            .write.mode("overwrite")
            .partitionBy(self.cell_col)
            .parquet(self.data_dir)
        )
        (partition_lineage(result, self.cell_col)
         .withColumn("batch_id", F.lit(-1).cast("long"))
         .write.mode("append").parquet(self.lineage_dir))
        result.unpersist()

    def _append_data(self, result: DataFrame, batch_id: int) -> None:
        """Data half of append_commit (factored so tests can simulate a
        crash between the data write and the lineage append). The batch
        writes into (cell_id, _batch_id) partitions with DYNAMIC
        OVERWRITE: other batches' partitions are untouched, and a
        REPLAY of this batch replaces its own half-written partitions
        instead of appending next to them — the write is idempotent."""
        (
            result.withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
            .repartition(self.cell_col)
            .write.mode("overwrite")
            .partitionBy(self.cell_col, "_batch_id")
            .parquet(self.data_dir)
        )

    def append_commit(self, result: DataFrame, batch_id: int) -> None:
        """APPEND-mode commit for continuous ingestion (one call per
        micro-batch): the batch's rows land in (cell_id, _batch_id)
        partitions and its per-partition lineage rows record
        ``batch_id``. Gate replays on ``is_batch_committed`` (the
        idempotent-foreachBatch pattern; streaming.ingest_stream wires
        it). The two writes are still non-atomic, but a crash between
        them is now harmless (ADVICE r5): the batch's data partitions
        carry its _batch_id, so output()/verify() EXCLUDE them until the
        lineage row lands, and the replay's dynamic partition overwrite
        replaces the half-written files rather than duplicating them.
        A cell's live content is the UNION of its committed appends, so
        verify() matches such cells through the AGGREGATE of their
        lineage rows (sum of counts, xor of checksums — the checksum is
        xor-combined per row, hence mergeable across batches). Do not
        mix commit() and append_commit() on one run: overwritten rows
        would stay in the lineage and break the aggregate reading."""
        result = result.cache()
        self._append_data(result, batch_id)
        (partition_lineage(result, self.cell_col)
         .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
         .write.mode("append").parquet(self.lineage_dir))
        result.unpersist()

    def committed_batches(self) -> set[int]:
        """Batch ids with at least one recorded lineage row."""
        lin = self.lineage()
        if "batch_id" not in lin.columns:
            return set()
        return {r.batch_id for r in
                lin.select("batch_id").distinct().collect()
                if r.batch_id is not None and r.batch_id >= 0}

    def is_batch_committed(self, batch_id: int) -> bool:
        return int(batch_id) in self.committed_batches()

    def output(self) -> DataFrame:
        """The run's live table. Append-mode layouts (data partitioned
        by _batch_id) are filtered to COMMITTED batches — rows whose
        batch crashed before its lineage append are invisible until the
        replay re-lands them."""
        df = self.spark.read.parquet(self.data_dir)
        if "_batch_id" not in df.columns:
            return df
        committed = (self.lineage()
                     .filter(F.col("batch_id") >= 0)
                     .select(F.col("batch_id").alias("_batch_id"))
                     .distinct())
        return (df.join(F.broadcast(committed), "_batch_id", "left_semi")
                .drop("_batch_id"))

    def verify(self) -> DataFrame:
        """Recompute per-partition lineage from the STORED output and
        check it against the recorded rows — full content verification
        (row_count AND order-insensitive checksum), not just counts.
        Returns the cell_ids claimed complete whose stored bytes no
        longer reproduce any recorded lineage row (empty = healthy).
        A cell with several recorded rows (re-commit after a crash
        between data write and lineage append) is healthy if ANY of
        them matches — dynamic partition overwrite makes the last data
        write the live one, and its lineage row is among the records."""
        if not os.path.isdir(self.data_dir):  # nothing committed yet
            return self.spark.createDataFrame([], "cell_id long")
        actual = partition_lineage(self.output(), self.cell_col)
        recorded = self.lineage()
        matched = recorded.join(
            actual, ["cell_id", "row_count", "checksum"], "left_semi"
        ).select("cell_id").distinct()
        # append-mode cells (ingestion): live content is the union of
        # the cell's appends, so the AGGREGATE of its lineage rows must
        # match — counts sum; checksums xor (the per-row xor-combine is
        # mergeable across batches; xor the two 8-hex halves so the
        # unsigned 64-bit value never touches a signed cast)
        hi = F.conv(F.substring("checksum", 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring("checksum", 9, 8), 16, 10).cast("long")
        def agg_ck(df):
            return df.groupBy("cell_id").agg(
                F.sum("row_count").alias("row_count"),
                F.format_string(
                    "%08x%08x", F.bit_xor(hi), F.bit_xor(lo)
                ).alias("checksum"),
            )
        agg_matched = agg_ck(recorded).join(
            agg_ck(actual), ["cell_id", "row_count", "checksum"], "left_semi"
        ).select("cell_id").distinct()
        healthy = matched.unionByName(agg_matched).distinct()
        return (recorded.select("cell_id").distinct()
                .join(healthy, "cell_id", "left_anti"))
