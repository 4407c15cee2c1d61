"""Table IO seam: parquet in the sandbox, Iceberg on a real cluster.

The reference's GeoPackage layer IO (gpd.read_file / OGR writer,
/root/reference/src/helpers.py:63-282) maps to catalog tables. The sandbox
has no Iceberg jars, so `format("iceberg")` is a config switch behind this
seam — all operators call save_table/load_table and never name a format.

Design notes for the 100 TB target:
- writes are range-partitioned on the tile cell (parent Morton cell) so
  files cluster spatially → partition pruning on tile predicates;
- ``snapshot`` emulates Iceberg time travel in the parquet stand-in by
  versioned subdirectories (sandbox only); on Iceberg it becomes
  ``option("snapshot-id", ...)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

try:  # Iceberg jars present only on a real cluster
    _ICEBERG = os.environ.get("EGP_ICEBERG_CATALOG") is not None
except Exception:  # pragma: no cover
    _ICEBERG = False


def load_table(spark: SparkSession, path_or_name: str, snapshot: str | None = None) -> DataFrame:
    if _ICEBERG:  # pragma: no cover - cluster-only path
        reader = spark.read.format("iceberg")
        if snapshot is not None:
            reader = reader.option("snapshot-id", snapshot)
        return reader.load(path_or_name)
    if snapshot is not None:
        return spark.read.parquet(os.path.join(path_or_name, f"_snapshot={snapshot}"))
    return spark.read.parquet(path_or_name)


def save_table(
    df: DataFrame,
    path_or_name: str,
    mode: str = "overwrite",
    range_partition_col: str | None = None,
    num_partitions: int | None = None,
    snapshot: str | None = None,
) -> None:
    if range_partition_col is not None:
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, range_partition_col)
    if _ICEBERG:  # pragma: no cover - cluster-only path
        df.writeTo(path_or_name).createOrReplace()
        return
    if snapshot is not None:
        path_or_name = os.path.join(path_or_name, f"_snapshot={snapshot}")
    df.write.mode(mode).parquet(path_or_name)


def save_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    num_buckets: int | None = None,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_col``
    between tables bucketed the same way need NO shuffle (the engine's
    co-location primitive for repeatedly-joined fact tables — e.g. the
    images table and its tile-assignment outputs bucketed on cell_id).
    On Iceberg this maps to a `bucket(N, col)` partition transform."""
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    writer = df.write.mode("overwrite").bucketBy(n, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(name)


def table_exists(spark: SparkSession, path_or_name: str) -> bool:
    """Reference `fiona.listlayers` probe (validate_topology.py:66-73)."""
    if _ICEBERG:  # pragma: no cover
        return spark.catalog.tableExists(path_or_name)
    return os.path.isdir(path_or_name) or os.path.isfile(path_or_name)


def drop_table(spark: SparkSession, path_or_name: str) -> None:
    """Reference GPKG layer delete (helpers.py:63-107 recreates layers by
    delete-then-create). Idempotent: dropping a missing table is a no-op."""
    if _ICEBERG:  # pragma: no cover - cluster-only path
        spark.sql(f"drop table if exists {path_or_name}")
        return
    import shutil

    # table_exists treats a plain file as an existing table, so drop must
    # remove that case too — rmtree(ignore_errors) silently no-ops on a
    # file, which would break the drop→probe idempotence contract
    if os.path.isfile(path_or_name):
        os.remove(path_or_name)
    else:
        shutil.rmtree(path_or_name, ignore_errors=True)
