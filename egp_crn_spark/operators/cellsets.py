"""Cell-set compaction — H3-style compact/uncompact on Morton cells.

compact: whenever all 4 children of a parent are present, replace them
with the parent, recursively — polyfills of large polygons shrink by
~4× per level, which shrinks the broadcast prefilter tables
(BASELINE.json north_star: "res 7-10 with compact/uncompact").
uncompact: expand cells to a uniform finer resolution (pure Column —
children of a cell are a contiguous Morton range).

A multi-resolution cell set joins points via parent-cell equi-joins at
each distinct resolution (join_multires below) — the standard trick for
joining against compacted polyfills without uncompacting them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cells import RES_SHIFT

_MORTON_MASK = (1 << RES_SHIFT) - 1


def cell_res(cell: Column) -> Column:
    return F.shiftright(cell, RES_SHIFT).cast("int")


def cell_parent_expr(cell: Column, levels: int = 1) -> Column:
    res = F.shiftright(cell, RES_SHIFT)
    morton = cell.bitwiseAND(F.lit(_MORTON_MASK))
    return (
        F.shiftleft(res - levels, RES_SHIFT)
        .bitwiseOR(F.shiftright(morton, 2 * levels))
        .cast("long")
    )


def compact_cells(cells: DataFrame, cell_col: str = "cell", min_res: int = 0) -> DataFrame:
    """Compact a DISTINCT cell set (single column) bottom-up. Iterates one
    DataFrame pass per resolution level actually present."""
    out = cells.select(F.col(cell_col).alias("cell")).distinct()
    max_res = out.agg(F.max(cell_res(F.col("cell")))).first()[0]
    if max_res is None:
        return out
    for r in range(int(max_res), min_res, -1):
        cur = out.filter(cell_res(F.col("cell")) == r)
        rest = out.filter(cell_res(F.col("cell")) != r)
        parents_full = (
            cur.groupBy(cell_parent_expr(F.col("cell")).alias("parent"))
            .count()
            .filter("count = 4")
            .select("parent")
        )
        demoted = parents_full.select(F.col("parent").alias("cell"))
        kept = cur.join(
            parents_full,
            cell_parent_expr(cur["cell"]) == parents_full["parent"],
            "left_anti",
        )
        out = rest.unionByName(kept).unionByName(demoted).cache()
    return out


def uncompact_cells(cells: DataFrame, target_res: int, cell_col: str = "cell") -> DataFrame:
    """Expand every cell to its descendants at ``target_res`` (cells
    already at target pass through; finer cells are rejected upstream).
    Children of a Morton cell are one contiguous range — pure Column."""
    res = cell_res(F.col(cell_col))
    d = (F.lit(target_res) - res).cast("int")
    morton = F.col(cell_col).bitwiseAND(F.lit(_MORTON_MASK))
    # per-row shift amount: shiftleft needs a literal, so multiply by 4^d
    # (exact in double up to d=16 → 4^16 = 2^32)
    base = morton * F.pow(F.lit(4.0), d).cast("long")
    n_children = F.pow(F.lit(4.0), d).cast("long")
    return cells.select(
        F.explode(F.sequence(F.lit(0).cast("long"), n_children - 1)).alias("_i"),
        base.alias("_base"),
    ).select(
        (F.lit(target_res << RES_SHIFT) + F.col("_base") + F.col("_i")).cast("long").alias("cell")
    )


def join_points_to_multires_cells(points: DataFrame, cellset: DataFrame,
                                  point_res: int, cell_col: str = "cell") -> DataFrame:
    """Join points (carrying a cell id at ``point_res``) against a
    COMPACTED multi-resolution cell set: one equi-join per distinct
    resolution present, on the point's parent at that resolution —
    avoids uncompacting the set."""
    reses = [r[0] for r in cellset.select(cell_res(F.col(cell_col)).alias("r")).distinct().collect()]
    parts = []
    for r in sorted(reses):
        sub = cellset.filter(cell_res(F.col(cell_col)) == r)
        key = cell_parent_expr(F.col("_pt_cell"), point_res - r) if r < point_res else F.col("_pt_cell")
        parts.append(
            points.withColumn("_join_cell", key).join(
                F.broadcast(sub.withColumnRenamed(cell_col, "_join_cell")), "_join_cell"
            ).drop("_join_cell")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
