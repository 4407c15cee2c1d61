"""Geometric dissolve — group-by union of faces (A4 of SURVEY.md §2.4).

Re-expresses `meshblock.dissolve(by=bb_uid)` (review_meshblock.py:83):
merge each block's faces into its outer boundary polygon(s).

Relational reduction instead of pairwise geometric union: within a block,
a ring segment shared by two faces is interior; segments used exactly
once form the block's boundary. Re-chaining those boundary segments with
the half-edge polygonize kernel yields the dissolved outer ring(s) —
one groupBy + one per-block kernel call, no O(faces²) unions.
(Blocks with holes emit the hole rings as additional faces; the caller
keeps the largest-area ring when hole-free output is required.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geomexpr as GX
from ..functions.polygonize_kernel import polygonize_segments
from . import nodes as N

DISSOLVED_SCHEMA = "bb_uid long, ring_idx int, vertices array<array<double>>, area double"


def dissolve_blocks(faces: DataFrame, block_col: str = "bb_uid",
                    vertices: str = "vertices",
                    packed_keys: bool = True) -> DataFrame:
    """faces: (bb_uid, vertices ring). Returns dissolved rings per block.
    ``packed_keys`` (default True, VERDICT r6 #7) keys segments with
    node_key_packed structs instead of printf strings — same node
    identity classes (see node_key_packed); the canonical
    (least, greatest) pair order differs but the keys feed only the
    groupBy equality, and boundary rows (_n = 1) carry deterministic
    coords either way. Measured 1.2x on the 90k-face boundary stage
    (BENCH/TOPOLOGY.md round-7 note); the same swap measured NO win at
    snap_nodes and mb_v202 (string keys kept there). Keys are internal
    only; output is coordinates."""
    key = N.node_key_packed if packed_keys else N.node_key
    ring = faces.select(
        F.col(block_col),
        F.concat(F.col(vertices), F.slice(F.col(vertices), 1, 1)).alias("rv"),
    )
    segs = ring.select(
        F.col(block_col), F.explode(GX.segment_pairs(F.col("rv"))).alias("s")
    ).select(
        block_col,
        F.element_at("s.a", 1).alias("ax"), F.element_at("s.a", 2).alias("ay"),
        F.element_at("s.b", 1).alias("bx"), F.element_at("s.b", 2).alias("by"),
        F.least(key(F.col("s.a")), key(F.col("s.b"))).alias("_k1"),
        F.greatest(key(F.col("s.a")), key(F.col("s.b"))).alias("_k2"),
    )
    # boundary segments: used exactly once within the block
    w_cnt = segs.groupBy(block_col, "_k1", "_k2").agg(
        F.count("*").alias("_n"),
        F.first("ax").alias("ax"), F.first("ay").alias("ay"),
        F.first("bx").alias("bx"), F.first("by").alias("by"),
    )
    boundary = w_cnt.filter("_n = 1")

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        bb = pdf[block_col].iloc[0]
        segments = [((a, b), (c, d)) for a, b, c, d in
                    zip(pdf["ax"], pdf["ay"], pdf["bx"], pdf["by"])]
        rings = polygonize_segments(segments)
        rows = []
        for i, r in enumerate(rings):
            x, y = r[:, 0], r[:, 1]
            area = abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0
            rows.append((int(bb), i, [[float(p), float(q)] for p, q in r], float(area)))
        return pd.DataFrame(rows, columns=["bb_uid", "ring_idx", "vertices", "area"])

    return boundary.groupBy(block_col).applyInPandas(per_block, schema=DISSOLVED_SCHEMA)


def explode_multipart(df: DataFrame, parts_col: str = "parts",
                      vertices: str = "vertices") -> DataFrame:
    """MultiLineString → LineStrings (helpers.explode_geometry,
    helpers.py:181-208): one row per part."""
    return df.withColumn(vertices, F.explode(F.col(parts_col))).drop(parts_col)
