"""Streaming & incremental processing.

The reference has NO streaming (SURVEY.md §2.10): its incremental
behaviour is snapshot-diff batch (deltas, crossings deltas, restore),
mapped here to operators/deltas.py + sources.tables snapshot reads.

This module adds the Structured Streaming surface a 100 TB ingestion
pipeline needs anyway: file-source streams of image/event rows,
watermarked windowed aggregation, streaming sessionization via
session_window, and streaming tile-count maintenance (the incremental
form of the tile-assignment job). All queries are expressed so the SAME
transformations run in batch (`spark.read`) and streaming
(`spark.readStream`) — tested with the memory sink +
processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions.georef import phash_x, phash_y


def windowed_event_counts(events: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Late-data-tolerant windowed counts per event type."""
    # watermarks require TIMESTAMP (tz-aware); parquet event time is NTZ
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    # decimal-exact sum → double: value totals are order-insensitive, so
    # stream == batch == SQL oracle bit-for-bit (float sums are not)
    return src.groupBy(F.window("ts", window), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
    )


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions per user via session_window (the streaming twin
    of driverq.q_sessionize)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy(F.session_window("ts", gap), "user_id").agg(
        F.count("*").alias("n_events"), F.min("ts").alias("first_ts")
    )


def streaming_tile_counts(images: DataFrame, res: int = 6) -> DataFrame:
    """Incrementally maintained per-tile image counts — the streaming form
    of the tile-assignment flagship (phash → cell, pure Column so the
    plan is identical in batch and streaming)."""
    return (
        images.select(
            C.cell_of_xy(phash_x(F.col("phash")), phash_y(F.col("phash")), res).alias("tile")
        )
        .groupBy("tile")
        .agg(F.count("*").alias("n"))
    )


def streaming_dedup(stream: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", shards: int = 32) -> DataFrame:
    """Custom stateful operator: exact dedup ACROSS micro-batches.

    State = the set of content hashes seen so far, sharded by hash prefix
    so state is partitioned (each shard's state stays bounded and the
    state store scales horizontally). First occurrence of a hash is
    emitted; later occurrences — in the same or any later micro-batch —
    are dropped. The streaming twin of operators/dedup.dedup_exact.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("ck"),
    ).withColumn("shard", F.pmod(F.xxhash64("ck"), F.lit(shards)))

    def dedup_fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out_ids, out_cks = [], []
        for pdf in pdfs:
            for did, ck in zip(pdf["doc_id"], pdf["ck"]):
                if ck not in seen:
                    seen.add(ck)
                    out_ids.append(did)
                    out_cks.append(ck)
        state.update((list(seen),))
        yield pd.DataFrame({"doc_id": out_ids, "ck": out_cks})

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup_fn,
        outputStructType="doc_id long, ck string",
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
