"""Topology validations 101–303 — flag-column transformations.

Re-expresses /root/reference/src/topology/validate_topology.py: each
validation returns the set of offending ``segment_id``s; ``write_errors``
pivots them into ``v<code>`` int columns (validate_topology.py:156-172).

| code | name                      | reference            | plan shape |
|------|---------------------------|----------------------|------------|
| 101  | construction_simple       | :328-345 (is_simple) | per-row kernel (scalar pandas UDF) |
| 102  | construction_cluster_tol  | :296-326             | pure Column (min segment length)   |
| 201  | duplication_duplicated    | :347-371 (equals)    | checksum groupBy (no O(n²) equals) |
| 202  | duplication_overlap       | :373-392 (overlaps)  | cell self-join + collinear kernel  |
| 301  | connectivity_node_inter   | :235-272             | relational (endpoints × interiors) |
| 302  | connectivity_min_distance | :174-233             | deadend distance join − connected  |
| 303  | connectivity_segmentation | :274-294 (crosses)   | cell self-join + crossing kernel   |
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CLUSTER_TOLERANCE, MIN_DISTANCE
from ..functions import geomexpr as GX
from ..functions import geomkernel as GK
from ..functions.cells import res_for_radius
from . import nodes as N
from .distance import point_to_arc_distance_join
from .spatial_join import rect_intersects_join


# ---------------------------------------------------------------- 101
def v101_simple(arcs: DataFrame, id_col: str = "segment_id",
                vertices: str = "vertices") -> DataFrame:
    """Arcs must be simple (no self-cross/overlap/touch). Kernel is per
    ROW (no join), so a scalar pandas UDF over the vertex array is the
    whole plan — and it only runs where non-simplicity is POSSIBLE: a
    2-vertex arc with distinct endpoints is simple by construction, and
    in a standardized network that is the overwhelming majority, so the
    Column prefilter keeps ~all rows out of Python entirely."""
    @F.pandas_udf("boolean")
    def _simple(vs: pd.Series) -> pd.Series:
        return pd.Series(
            [GK.polyline_is_simple(np.asarray([list(p) for p in v], dtype=np.float64))
             for v in vs]
        )

    v = F.col(vertices)
    may_violate = (F.size(v) > 2) | (F.element_at(v, 1) == F.element_at(v, 2))
    return (
        arcs.filter(may_violate)
        .filter(~_simple(v))
        .select(F.col(id_col).alias("flagged_id"))
    )


# ---------------------------------------------------------------- 102
def v102_cluster_tolerance(arcs: DataFrame, tol: float = CLUSTER_TOLERANCE,
                           id_col: str = "segment_id",
                           vertices: str = "vertices") -> DataFrame:
    """Adjacent vertices must be >= tol apart; only arcs with > 2 vertices
    are checked (validate_topology.py:307)."""
    return arcs.filter(
        (F.size(vertices) > 2) & (GX.min_segment_length(F.col(vertices)) < tol)
    ).select(F.col(id_col).alias("flagged_id"))


# ---------------------------------------------------------------- 201
def v201_duplicated(arcs: DataFrame, id_col: str = "segment_id",
                    vertices: str = "vertices") -> DataFrame:
    """Duplicate geometries via direction-insensitive checksum equi-join —
    replaces the reference's filter-cascade + O(n²) pairwise `equals`
    (validate_topology.py:357-365) with one hash aggregation."""
    with_ck = arcs.select(F.col(id_col), GX.geom_checksum(F.col(vertices)).alias("_ck"))
    dup_cks = with_ck.groupBy("_ck").count().filter("count > 1").select("_ck")
    return with_ck.join(dup_cks, "_ck", "left_semi").select(F.col(id_col).alias("flagged_id"))


# ---------------------------------------------------------------- pairwise prefilter
def _arc_pair_candidates(arcs: DataFrame, res: int, id_col: str, vertices: str) -> DataFrame:
    """Candidate arc pairs by bbox-cell intersection (a_id < b_id once),
    carrying both vertex arrays for the refine kernel."""
    v = F.col(vertices)
    boxed = arcs.select(
        F.col(id_col).alias("a_id"),
        v.alias("averts"),
        GX.bbox(v).alias("_bb"),
    ).select(
        "a_id", "averts",
        F.col("_bb.xmin").alias("axmin"), F.col("_bb.ymin").alias("aymin"),
        F.col("_bb.xmax").alias("axmax"), F.col("_bb.ymax").alias("aymax"),
    )
    other = (
        boxed.select(
            F.col("a_id").alias("b_id"), F.col("averts").alias("bverts"),
            F.col("axmin").alias("bxmin"), F.col("aymin").alias("bymin"),
            F.col("axmax").alias("bxmax"), F.col("aymax").alias("bymax"),
        )
    )
    pairs = rect_intersects_join(boxed, other, res=res)
    return pairs.filter(F.col("a_id") < F.col("b_id"))


def _pair_refine(pairs: DataFrame, kernel, out_name: str,
                 seg_fast=None) -> DataFrame:
    """Run a numpy pair-kernel over candidate pairs; returns pairs where
    kernel(a, b) is True. mapInPandas keeps only ids + verdict.

    ``seg_fast``: optional VECTORIZED kernel for the 2-vertex x 2-vertex
    case — (p1, p2, q1, q2) arrays of shape (n, 2) → bool mask. Most of
    a noded network is single segments, so batching them through one
    numpy pass instead of a per-pair Python call is the difference
    between a per-batch loop of thousands and a handful of array ops."""
    def refine(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            hits_a, hits_b = [], []
            rows = zip(pdf["a_id"], pdf["b_id"], pdf["averts"], pdf["bverts"])
            if seg_fast is not None:
                fast_rows, slow_rows = [], []
                for row in rows:
                    (fast_rows if len(row[2]) == 2 and len(row[3]) == 2
                     else slow_rows).append(row)
                if fast_rows:
                    p1 = np.array([[*r[2][0]] for r in fast_rows], dtype=np.float64)
                    p2 = np.array([[*r[2][1]] for r in fast_rows], dtype=np.float64)
                    q1 = np.array([[*r[3][0]] for r in fast_rows], dtype=np.float64)
                    q2 = np.array([[*r[3][1]] for r in fast_rows], dtype=np.float64)
                    mask = seg_fast(p1, p2, q1, q2)
                    for r, hit in zip(fast_rows, mask):
                        if hit:
                            hits_a.append(r[0])
                            hits_b.append(r[1])
                rows = slow_rows
            for aid, bid, av, bv in rows:
                a = np.asarray([list(p) for p in av], dtype=np.float64)
                b = np.asarray([list(p) for p in bv], dtype=np.float64)
                if kernel(a, b):
                    hits_a.append(aid)
                    hits_b.append(bid)
            if hits_a:
                yield pd.DataFrame({"a_id": hits_a, "b_id": hits_b})

    return pairs.select("a_id", "b_id", "averts", "bverts").mapInPandas(
        refine, schema="a_id string, b_id string"
    )


def _pairs_to_flags(hit_pairs: DataFrame) -> DataFrame:
    return (
        hit_pairs.select(F.col("a_id").alias("flagged_id"))
        .unionAll(hit_pairs.select(F.col("b_id").alias("flagged_id")))
        .distinct()
    )


# ---------------------------------------------------------------- 202
def v202_overlap(arcs: DataFrame, res: int = 10, id_col: str = "segment_id",
                 vertices: str = "vertices",
                 pair_candidates: DataFrame | None = None) -> DataFrame:
    """Arcs must not overlap (share a collinear positive-length section).
    shapely `overlaps` excludes equal geometries, so checksum-equal pairs
    are removed before the kernel (validate_topology.py:383-392).
    ``pair_candidates`` lets the composed validate_topology() share one
    cached bbox-cell self-join between 202 and 303."""
    cand = (pair_candidates if pair_candidates is not None
            else _arc_pair_candidates(arcs, res, id_col, vertices))
    ck = arcs.select(F.col(id_col), GX.geom_checksum(F.col(vertices)).alias("_ck"))
    cand = (
        cand.join(ck.withColumnRenamed(id_col, "a_id").withColumnRenamed("_ck", "_ck_a"), "a_id")
        .join(ck.withColumnRenamed(id_col, "b_id").withColumnRenamed("_ck", "_ck_b"), "b_id")
        .filter(F.col("_ck_a") != F.col("_ck_b"))
    )
    return _pairs_to_flags(_pair_refine(
        cand, GK.polylines_overlap, "overlaps",
        seg_fast=GK.segments_overlap,
    ))


# ---------------------------------------------------------------- 303
def v303_crosses(arcs: DataFrame, res: int = 10, id_col: str = "segment_id",
                 vertices: str = "vertices",
                 pair_candidates: DataFrame | None = None) -> DataFrame:
    """Arcs must not cross (must be segmented at intersections) —
    validate_topology.py:274-294. For single-segment pairs (no interior
    vertices) shapely `crosses` reduces to the proper-crossing test,
    which vectorizes across the whole Arrow batch."""
    cand = (pair_candidates if pair_candidates is not None
            else _arc_pair_candidates(arcs, res, id_col, vertices))
    return _pairs_to_flags(_pair_refine(
        cand, GK.polylines_cross_shapely, "crosses",
        seg_fast=GK.segments_properly_intersect,
    ))


# ---------------------------------------------------------------- 301
def v301_node_intersection(arcs: DataFrame, id_col: str = "segment_id",
                           vertices: str = "vertices") -> DataFrame:
    """Arcs must only connect at endpoints: an endpoint node coinciding
    with an interior vertex (of a >2-vertex arc), where the node is
    referenced by more than one arc, flags every arc whose INTERIOR holds
    that point (validate_topology.py:235-272)."""
    allv = N.all_vertex_nodes(arcs, id_col, vertices)
    endpoints = allv.filter((F.col("vertex_idx") == 0) | (F.col("vertex_idx") == F.col("n_vertices") - 1))
    interiors = allv.filter(
        (F.col("n_vertices") > 2)
        & (F.col("vertex_idx") > 0)
        & (F.col("vertex_idx") < F.col("n_vertices") - 1)
    )
    # node referenced by > 1 arc (any vertex reference — pts_id_lookup)
    multi_ref = (
        allv.select("node", id_col).distinct().groupBy("node").count().filter("count > 1").select("node")
    )
    invalid_pts = (
        endpoints.select("node").distinct()
        .join(interiors.select("node").distinct(), "node", "left_semi")
        .join(multi_ref, "node", "left_semi")
    )
    return (
        interiors.join(invalid_pts, "node", "left_semi")
        .select(F.col(id_col).alias("flagged_id"))
        .distinct()
    )


# ---------------------------------------------------------------- 302
def v302_min_distance(arcs: DataFrame, min_dist: float = MIN_DISTANCE,
                      id_col: str = "segment_id",
                      vertices: str = "vertices") -> DataFrame:
    """Deadend arcs must be >= min_dist from arcs they are not connected
    to (validate_topology.py:174-233): for each deadend node, find arcs
    within min_dist, subtract arcs sharing ANY vertex-node with the
    deadend arc's endpoints, flag the deadend arc + disconnected arcs."""
    dead = N.deadends(arcs, id_col, vertices).withColumnRenamed(id_col, "src_id")
    hits = point_to_arc_distance_join(
        dead.select(F.col("node").alias("p_id"), "x", "y"),
        arcs, min_dist, id_col=id_col, vertices=vertices,
        res=res_for_radius(min_dist),
    ).select(F.col("p_id").alias("node"), F.col(id_col).alias("near_id"))
    hits = hits.join(dead.select("node", "src_id"), "node")
    # connected = arcs referencing either endpoint NODE of the source arc
    # (pts_id_lookup over ALL vertices — validate_topology.py:211-215)
    src_end_nodes = (
        N.endpoint_nodes(arcs, id_col, vertices)
        .select(F.col(id_col).alias("src_id"), "node")
    )
    allv = N.all_vertex_nodes(arcs, id_col, vertices).select(
        "node", F.col(id_col).alias("near_id")
    ).distinct()
    connected = src_end_nodes.join(allv, "node").select("src_id", "near_id").distinct()
    # per-arc SET subtraction (validate_topology.py:219-221): an arc with
    # BOTH endpoints deadends near the same arc yields the pair twice in
    # hits but once in connected — a multiset exceptAll would leak one
    # occurrence, so distinct first, then anti-join.
    disconnected = (
        hits.select("src_id", "near_id")
        .filter(F.col("src_id") != F.col("near_id"))
        .distinct()
        .join(connected, ["src_id", "near_id"], "left_anti")
    )
    return (
        disconnected.select(F.col("src_id").alias("flagged_id"))
        .unionAll(disconnected.select(F.col("near_id").alias("flagged_id")))
        .distinct()
    )


# ---------------------------------------------------------------- driver
VALIDATIONS = {
    303: v303_crosses,
    101: v101_simple,
    102: v102_cluster_tolerance,
    201: v201_duplicated,
    202: v202_overlap,
    301: v301_node_intersection,
    302: v302_min_distance,
}


def validate_topology(arcs: DataFrame, codes: list[int] | None = None,
                      id_col: str = "segment_id") -> DataFrame:
    """Run validations and pivot flag sets into v<code> int columns
    (validate_topology.py:156-172). ``arcs`` should be standardized first.

    202 and 303 accept a shared precomputed ``pair_candidates`` frame,
    but the composed run does NOT cache one by default: materializing
    millions of candidate rows that carry BOTH vertex arrays costs more
    than recomputing the prefilter (measured 2x slower at 500k arcs) —
    callers with small-vertex networks can opt in explicitly."""
    out = arcs
    arcs = arcs.cache()  # shared normalized projection across 7 validations
    for code in codes or sorted(VALIDATIONS):
        flagged = VALIDATIONS[code](arcs).withColumn(f"v{code}", F.lit(1))
        out = out.join(
            flagged.withColumnRenamed("flagged_id", id_col), id_col, "left"
        ).fillna({f"v{code}": 0})
    return out
