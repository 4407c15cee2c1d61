"""Vector tile materialization — clip arcs into per-cell tiles per zoom.

The raster half of the BASELINE.json "raster↔vector tile
materialization" lives in operators/images.py (per-tile decode/PSNR)
and operators/pyramid.py (the zoom stack); this is the VECTOR half:
every arc is cut into the cells it crosses, boundary intersections
inserted exactly, so each tile can be rendered/served independently.
Composes with operators/generalize.py (simplify first, then cut) for a
full per-zoom vector tile build.

Scale shape: the candidate explosion is the engine's standard
bbox-cover-cell prefilter (arc bbox → covering cells at ``res``; road
arcs are short, so covers are a handful of cells; degenerate
domain-spanning arcs are bounded by ``max_cover``), and the clip is an
Arrow-batched Liang–Barsky kernel — one shuffle-free pass, no joins.

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
    Raises inside the kernel if an arc's bbox covers more than
    ``max_cover`` cells (a domain-spanning arc at fine res — simplify
    or coarsen first; silent truncation would break the length
    invariant)."""
    cs = cell_size(res)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, tiles, parts, verts = [], [], [], []
            for aid, v in zip(pdf[id_col], pdf[vertices_col]):
                if v is None or len(v) < 2:
                    continue
                line = np.asarray([[p[0], p[1]] for p in v],
                                  dtype=np.float64)
                xmin, ymin = line.min(axis=0)
                xmax, ymax = line.max(axis=0)
                cover = cells_covering_bbox(xmin, ymin, xmax, ymax, res)
                if len(cover) > max_cover:
                    raise ValueError(
                        f"arc {aid!r} covers {len(cover)} cells at res "
                        f"{res} (> max_cover={max_cover}); generalize "
                        "or tile at a coarser resolution")
                ix, iy = cell_to_ixy_np(cover)
                for cell, cx, cy in zip(cover, ix, iy):
                    x0, y0 = cx * cs, cy * cs
                    for k, piece in enumerate(clip_polyline_to_box(
                            line, x0, y0, x0 + cs, y0 + cs)):
                        ids.append(aid)
                        tiles.append(int(cell))
                        parts.append(k)
                        verts.append([list(p) for p in piece])
            out = pd.DataFrame({id_col: ids, "tile": tiles, "part": parts})
            out["vertices"] = pd.Series(verts, dtype=object)
            yield out

    schema = (f"{id_col} long, tile long, part int, "
              "vertices array<array<double>>")
    return arcs.select(id_col, vertices_col).mapInPandas(gen, schema)
