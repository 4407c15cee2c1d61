"""Vector tile materialization — clip arcs into per-cell tiles per zoom.

The raster half of the BASELINE.json "raster↔vector tile
materialization" lives in operators/images.py (per-tile decode/PSNR)
and operators/pyramid.py (the zoom stack); this is the VECTOR half:
every arc is cut into the cells it crosses, boundary intersections
inserted exactly, so each tile can be rendered/served independently.
Composes with operators/generalize.py (simplify first, then cut) for a
full per-zoom vector tile build.

Scale shape: one shuffle-free Arrow-batched pass, no joins. The kernel
walks each arc's SEGMENTS in path order, assigns every segment to the
cells its own bbox covers (one or two for any segment shorter than a
cell edge), Liang–Barsky-clips it per cell, and stitches consecutive
clipped runs per cell in place — O(vertices) per arc regardless of how
many cells the WHOLE arc spans (the naive whole-line-per-cover-cell
clip is O(vertices × cells) and melts on long arcs). ``max_cover``
bounds the per-arc tile fan-out (output rows), not the compute.

The load-bearing invariant (driver-checked in q_vector_tiles and
pinned in tests): a tile grid partitions the plane, so the pieces of an
arc sum to EXACTLY the arc's length — nothing dropped, nothing
double-counted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import (cell_size, cell_to_ixy_np,
                               cells_covering_bbox)
from ..functions.geomkernel import clip_polyline_to_box

__all__ = ["vector_tiles"]


def vector_tiles(arcs: DataFrame, res: int,
                 vertices_col: str = "vertices",
                 id_col: str = "arc_id",
                 max_cover: int = 4096) -> DataFrame:
    """Cut every polyline into per-cell pieces at resolution ``res``.
    Returns (id_col, tile, part, vertices): ``tile`` the Morton cell id,
    ``part`` the piece ordinal within (arc, tile) in path order.
    Raises inside the kernel if an arc touches more than ``max_cover``
    cells (a domain-spanning arc at fine res — simplify or coarsen
    first; silent truncation would break the length invariant)."""
    cs = cell_size(res)

    def _arc_pieces(line: np.ndarray) -> dict[int, list[np.ndarray]]:
        """cell id -> pieces in path order. Segments are assigned to
        the cells their OWN bbox covers and clipped there; consecutive
        clipped runs stitch when they continue exactly where the cell's
        open piece ended."""
        done: dict[int, list[np.ndarray]] = {}
        open_p: dict[int, list[np.ndarray]] = {}
        for a, b in zip(line[:-1], line[1:]):
            cover = cells_covering_bbox(
                min(a[0], b[0]), min(a[1], b[1]),
                max(a[0], b[0]), max(a[1], b[1]), res)
            ix, iy = cell_to_ixy_np(cover)
            interior = len(cover) == 1  # both endpoints in one cell →
            # the segment is fully inside (boxes are convex): skip clip
            for cell, cx, cy in zip(cover, ix, iy):
                cell = int(cell)
                if interior:
                    seg = np.array([a, b])
                    if (seg[0] == seg[1]).all():
                        continue
                else:
                    x0, y0 = cx * cs, cy * cs
                    clipped = clip_polyline_to_box(
                        np.array([a, b]), x0, y0, x0 + cs, y0 + cs)
                    if not clipped:
                        continue
                    seg = clipped[0]
                cur = open_p.get(cell)
                if cur is not None and (cur[-1] == seg[0]).all():
                    cur.append(seg[1])
                else:
                    if cur is not None and len(cur) >= 2:
                        done.setdefault(cell, []).append(np.asarray(cur))
                    open_p[cell] = [seg[0], seg[1]]
        for cell, cur in open_p.items():
            if len(cur) >= 2:
                done.setdefault(cell, []).append(np.asarray(cur))
        return done

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, tiles, parts, verts = [], [], [], []
            for aid, v in zip(pdf[id_col], pdf[vertices_col]):
                if v is None or len(v) < 2:
                    continue
                line = np.asarray([[p[0], p[1]] for p in v],
                                  dtype=np.float64)
                by_cell = _arc_pieces(line)
                if len(by_cell) > max_cover:
                    raise ValueError(
                        f"arc {aid!r} touches {len(by_cell)} cells at "
                        f"res {res} (> max_cover={max_cover}); "
                        "generalize or tile at a coarser resolution")
                for cell, pieces in by_cell.items():
                    for k, piece in enumerate(pieces):
                        ids.append(aid)
                        tiles.append(cell)
                        parts.append(k)
                        verts.append([list(p) for p in piece])
            out = pd.DataFrame({id_col: ids, "tile": tiles, "part": parts})
            out["vertices"] = pd.Series(verts, dtype=object)
            yield out

    schema = (f"{id_col} long, tile long, part int, "
              "vertices array<array<double>>")
    return arcs.select(id_col, vertices_col).mapInPandas(gen, schema)
