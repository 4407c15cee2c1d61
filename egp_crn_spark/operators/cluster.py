"""Spatial layout clustering — Z-order (Morton) clustered writes for
manifest-stats data skipping.

The snaplog catalog records per-file column min/max stats at commit and
prunes file lists from them (`SnapshotLogTable.plan_files` /
`read(where=...)`). Those stats only skip files when the FILE LAYOUT is
correlated with the predicate columns: a hash-distributed write spreads
every spatial neighbourhood over every file, so each file's [min, max]
on x and y spans the whole domain and a bbox predicate prunes nothing.
Z-order clustering fixes the layout: rows are range-partitioned and
sorted by the Morton interleave of (x, y) — the same cell scheme the
engine's spatial joins key on (functions/cells.py) — so every output
file covers a compact spatial block, per-file x/y stats become tight,
and a bbox query reads O(query area / file area) files instead of all
of them.

This is the Iceberg pair of features the reference's GPKG sink cannot
express (helpers.py:211-282 writes a single flat layer): a table-level
write SORT ORDER (SnapshotLogTable(sort_cols=...), applied on every
append/overwrite like Iceberg's `write.sort-order`) and an explicit
one-off `zorder_cluster` (Iceberg's `rewrite_data_files` with
`strategy => 'sort', sort_order => 'zorder(x, y)'`). At 100 TB the
clustered write costs one range exchange (the write had to shuffle
anyway for partition clustering) and converts full-table scans into
per-tile reads for every downstream bbox/tile query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import EXTENT, MAX_RES
from ..functions import cells as C

__all__ = ["zorder_key", "zorder_cluster", "skipping_report"]


def zorder_key(x: Column, y: Column, res: int = MAX_RES,
               bounds: tuple[float, float] | None = None) -> Column:
    """Morton interleave of (x, y) at ``res`` bits per axis — pure
    Column arithmetic (no Python stage). Coordinates are interpreted in
    the engine domain [0, EXTENT) unless ``bounds=(lo, hi)`` rescales
    them there first. Equal to the engine's cell id at ``res`` up to
    the constant resolution tag, so z-runs align with cell tiles."""
    if bounds is not None:
        lo, hi = bounds
        span = hi - lo
        if span <= 0:
            raise ValueError("bounds must satisfy hi > lo")
        scale = EXTENT / span
        x = (x - F.lit(lo)) * F.lit(scale)
        y = (y - F.lit(lo)) * F.lit(scale)
    return C.cell_of_xy(x, y, res)


def zorder_cluster(df: DataFrame, x_col: str, y_col: str,
                   res: int = MAX_RES, num_files: int | None = None,
                   bounds: tuple[float, float] | None = None) -> DataFrame:
    """Return ``df`` laid out in Z-order: range-partitioned into
    ``num_files`` contiguous Morton runs and sorted within each — every
    parquet file a subsequent write produces covers a compact spatial
    block. Row-preserving (a layout change only); write the result with
    plain ``.write.parquet`` or ``SnapshotLogTable.append`` on an
    unpartitioned table (whose stage path keeps the incoming layout).

    One range exchange (sampled boundaries are fine here: the layout
    only needs to be clustered, not reproducible across jobs — unlike
    sampling.pack_chunks, nothing downstream keys on partition ids)."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    z = zorder_key(F.col(x_col), F.col(y_col), res, bounds)
    return (
        df.withColumn("_zorder", z)
        .repartitionByRange(n, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )


def skipping_report(table, where: list[tuple],
                    snapshot_id: int | str | None = None) -> dict:
    """Data-skipping observability: how many files ``where`` prunes at
    the manifest level. Metadata-only (no data file opened)."""
    sid = table.resolve(snapshot_id)
    total = table.plan_files(sid)
    kept = table.plan_files(sid, where)
    return {
        "files_total": len(total),
        "files_read": len(kept),
        "rows_total": sum(e.get("rows") or 0 for e in total),
        "rows_scanned": sum(e.get("rows") or 0 for e in kept),
        "skipped_fraction": round(1.0 - len(kept) / max(len(total), 1), 4),
    }
