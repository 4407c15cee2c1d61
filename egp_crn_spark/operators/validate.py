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
from . import nodes as N
from .distance import point_near_arc_pairs
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
    # 128-bit struct key, not the md5 hex string: equality-only use, and
    # the narrower key measured ~1.8x on the 2M-arc aggregation
    with_ck = arcs.select(F.col(id_col), GX.geom_checksum128(F.col(vertices)).alias("_ck"))
    dup_cks = with_ck.groupBy("_ck").count().filter("count > 1").select("_ck")
    return with_ck.join(dup_cks, "_ck", "left_semi").select(F.col(id_col).alias("flagged_id"))


# ---------------------------------------------------------------- pairwise prefilter
def _arc_pair_candidates(arcs: DataFrame, res: int, id_col: str, vertices: str,
                         with_checksum: bool = False,
                         salt_hot: tuple[int, int] | None = None) -> DataFrame:
    """Candidate arc pairs by bbox-cell intersection (a_id < b_id once).

    COLUMN-PRUNED: the cell self-join ships only (id, n_vertices,
    endpoints, bbox) — never the vertex arrays. At dense cells the
    candidate count dwarfs the arc count, so attaching arrays to
    candidates multiplies shuffle bytes by the mean vertex size (the
    round-2 hotspot). Single-segment arcs — the overwhelming majority of
    a noded network — are FULLY described by their endpoint columns, so
    most pairs never need an array at all; `_refine_pairs` joins arrays
    back by id only for pairs involving a multi-vertex arc.

    ``with_checksum`` rides the geometry checksum along each side (v202's
    equality exclusion) — one extra column through the join beats two
    whole-candidate-set shuffles joining checksums back by id."""
    v = F.col(vertices)
    first, last = F.element_at(v, 1), F.element_at(v, -1)
    cols = [
        F.col(id_col).alias("a_id"),
        F.size(v).alias("anv"),
        F.element_at(first, 1).alias("ax1"), F.element_at(first, 2).alias("ay1"),
        F.element_at(last, 1).alias("ax2"), F.element_at(last, 2).alias("ay2"),
        GX.bbox(v).alias("_bb"),
    ]
    out_cols = ["a_id", "anv", "ax1", "ay1", "ax2", "ay2"]
    if with_checksum:
        cols.append(GX.geom_checksum128(v).alias("ack"))
        out_cols.append("ack")
    slim = arcs.select(*cols).select(
        *out_cols,
        F.col("_bb.xmin").alias("axmin"), F.col("_bb.ymin").alias("aymin"),
        F.col("_bb.xmax").alias("axmax"), F.col("_bb.ymax").alias("aymax"),
    )
    renames = [
        ("a_id", "b_id"), ("anv", "bnv"),
        ("ax1", "bx1"), ("ay1", "by1"), ("ax2", "bx2"), ("ay2", "by2"),
        ("axmin", "bxmin"), ("aymin", "bymin"),
        ("axmax", "bxmax"), ("aymax", "bymax"),
    ] + ([("ack", "bck")] if with_checksum else [])
    other = slim.select(*[F.col(a).alias(b) for a, b in renames])
    pairs = rect_intersects_join(slim, other, res=res, salt_hot=salt_hot,
                                 shuffle_hash_b=True)
    return pairs.filter(F.col("a_id") < F.col("b_id"))


def _orient_col(ax, ay, bx, by, cx, cy):
    """Column twin of geomkernel._orient — cross((b-a), (c-a))."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _seg_cross_col() -> F.Column:
    """Pure-Column twin of GK.segments_properly_intersect over candidate
    endpoint columns (p = a-segment, q = b-segment). Same EPS discipline,
    same operation order — IEEE-identical to the numpy kernel."""
    eps = GK.EPS
    a1x, a1y, a2x, a2y = F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2")
    b1x, b1y, b2x, b2y = F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2")
    d1 = _orient_col(b1x, b1y, b2x, b2y, a1x, a1y)
    d2 = _orient_col(b1x, b1y, b2x, b2y, a2x, a2y)
    d3 = _orient_col(a1x, a1y, a2x, a2y, b1x, b1y)
    d4 = _orient_col(a1x, a1y, a2x, a2y, b2x, b2y)
    return (
        (((d1 > eps) & (d2 < -eps)) | ((d1 < -eps) & (d2 > eps)))
        & (((d3 > eps) & (d4 < -eps)) | ((d3 < -eps) & (d4 > eps)))
    )


def _seg_overlap_col() -> F.Column:
    """Pure-Column twin of GK.segments_overlap: collinear with a
    positive-length shared section (p = a-segment, q = b-segment)."""
    eps = GK.EPS
    a1x, a1y, a2x, a2y = F.col("ax1"), F.col("ay1"), F.col("ax2"), F.col("ay2")
    b1x, b1y, b2x, b2y = F.col("bx1"), F.col("by1"), F.col("bx2"), F.col("by2")
    dx, dy = a2x - a1x, a2y - a1y
    l1 = F.sqrt(dx * dx + dy * dy)
    ok = l1 > eps
    c1 = dx * (b1y - a1y) - dy * (b1x - a1x)
    c2 = dx * (b2y - a1y) - dy * (b2x - a1x)
    col = (F.abs(c1) <= eps * l1) & (F.abs(c2) <= eps * l1)
    l2 = F.when(l1 > 0, l1 * l1).otherwise(F.lit(1.0))
    t1 = ((b1x - a1x) * dx + (b1y - a1y) * dy) / l2
    t2 = ((b2x - a1x) * dx + (b2y - a1y) * dy) / l2
    lo, hi = F.least(t1, t2), F.greatest(t1, t2)
    return ok & col & (F.least(hi, F.lit(1.0)) - F.greatest(lo, F.lit(0.0)) > eps)


def _refine_pairs(cand: DataFrame, arcs: DataFrame, kernel,
                  seg_fast_col: F.Column, id_col: str,
                  vertices: str) -> DataFrame:
    """Split candidate refinement:

    - both arcs single-segment (the bulk of a noded network): the exact
      predicate is the pure-Column ``seg_fast_col`` over the endpoint
      columns already on the candidate row — zero Python, zero extra
      shuffle;
    - any multi-vertex side: join that side's vertex array back by id
      (arrays shuffle once per MULTI-VERTEX arc, not once per candidate)
      and run the general numpy ``kernel`` via mapInPandas; a
      single-segment side reconstructs its 2-point array from the
      endpoint columns already on the row.

    ONE linear pipeline — fast hits ride through the same mapInPandas as
    pass-throughs, so the expensive cell self-join has exactly one
    consumer (a branch-and-union here would recompute it per branch, or
    force a persist barrier; both measured slower)."""
    both_single = (F.col("anv") == 2) & (F.col("bnv") == 2)
    reduced = cand.filter((both_single & seg_fast_col) | ~both_single).select(
        "a_id", "b_id", both_single.alias("_fast"),
        "ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2",
    )
    v = F.col(vertices)
    multi = arcs.filter(F.size(v) > 2)
    reduced = (
        reduced.join(multi.select(F.col(id_col).alias("a_id"), v.alias("averts")),
                     "a_id", "left")
        .join(multi.select(F.col(id_col).alias("b_id"), v.alias("bverts")),
              "b_id", "left")
    )

    def refine(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            # fast rows are pre-verified hits (the Column predicate ran in
            # the join stage) — take them in bulk, loop only the rows that
            # actually need the ragged-array kernel
            fast = pdf["_fast"].to_numpy(dtype=bool)
            hits_a = pdf["a_id"][fast].tolist()
            hits_b = pdf["b_id"][fast].tolist()
            slow = pdf[~fast]
            for (aid, bid, ax1, ay1, ax2, ay2, bx1, by1, bx2, by2,
                 av, bv) in zip(
                    slow["a_id"], slow["b_id"],
                    slow["ax1"], slow["ay1"], slow["ax2"], slow["ay2"],
                    slow["bx1"], slow["by1"], slow["bx2"], slow["by2"],
                    slow["averts"], slow["bverts"]):
                a = (np.asarray([list(p) for p in av], dtype=np.float64)
                     if av is not None
                     else np.array([[ax1, ay1], [ax2, ay2]], dtype=np.float64))
                b = (np.asarray([list(p) for p in bv], dtype=np.float64)
                     if bv is not None
                     else np.array([[bx1, by1], [bx2, by2]], dtype=np.float64))
                if kernel(a, b):
                    hits_a.append(aid)
                    hits_b.append(bid)
            if hits_a:
                yield pd.DataFrame({"a_id": hits_a, "b_id": hits_b})

    return reduced.mapInPandas(refine, schema="a_id string, b_id string")


def _pairs_to_flags(hit_pairs: DataFrame) -> DataFrame:
    # explode, NOT union-of-two-selects: a union would give the pair
    # pipeline (cell self-join + kernel refine) TWO consumers and Spark
    # would recompute it once per branch
    return (
        hit_pairs.select(F.explode(F.array("a_id", "b_id")).alias("flagged_id"))
        .distinct()
    )


# ---------------------------------------------------------------- 202
def v202_overlap(arcs: DataFrame, res: int = 10, id_col: str = "segment_id",
                 vertices: str = "vertices",
                 pair_candidates: DataFrame | None = None,
                 salt_hot: tuple[int, int] | None = None) -> DataFrame:
    """Arcs must not overlap (share a collinear positive-length section).
    shapely `overlaps` excludes equal geometries, so checksum-equal pairs
    are removed before the kernel (validate_topology.py:383-392).
    ``pair_candidates`` lets the composed validate_topology() share one
    cached bbox-cell self-join between 202 and 303."""
    if pair_candidates is not None and "ack" not in pair_candidates.columns:
        # shared candidates built without checksums: join them back by id
        ck = arcs.select(F.col(id_col), GX.geom_checksum128(F.col(vertices)).alias("_ck"))
        cand = (
            pair_candidates
            .join(ck.withColumnRenamed(id_col, "a_id").withColumnRenamed("_ck", "ack"), "a_id")
            .join(ck.withColumnRenamed(id_col, "b_id").withColumnRenamed("_ck", "bck"), "b_id")
        )
    else:
        cand = (pair_candidates if pair_candidates is not None
                else _arc_pair_candidates(arcs, res, id_col, vertices,
                                          with_checksum=True, salt_hot=salt_hot))
    cand = cand.filter(F.col("ack") != F.col("bck"))
    return _pairs_to_flags(_refine_pairs(
        cand, arcs, GK.polylines_overlap, _seg_overlap_col(), id_col, vertices,
    ))


# ---------------------------------------------------------------- 303
def v303_crosses(arcs: DataFrame, res: int = 10, id_col: str = "segment_id",
                 vertices: str = "vertices",
                 pair_candidates: DataFrame | None = None,
                 salt_hot: tuple[int, int] | None = None) -> DataFrame:
    """Arcs must not cross (must be segmented at intersections) —
    validate_topology.py:274-294. For single-segment pairs (no interior
    vertices) shapely `crosses` reduces to the proper-crossing test,
    which vectorizes across the whole Arrow batch."""
    cand = (pair_candidates if pair_candidates is not None
            else _arc_pair_candidates(arcs, res, id_col, vertices,
                                      salt_hot=salt_hot))
    return _pairs_to_flags(_refine_pairs(
        cand, arcs, GK.polylines_cross_shapely, _seg_cross_col(), id_col, vertices,
    ))


# ---------------------------------------------------------------- 301
def v301_node_intersection(arcs: DataFrame, id_col: str = "segment_id",
                           vertices: str = "vertices") -> DataFrame:
    """Arcs must only connect at endpoints: an endpoint node coinciding
    with an interior vertex (of a >2-vertex arc), where the node is
    referenced by more than one arc, flags every arc whose INTERIOR holds
    that point (validate_topology.py:235-272)."""
    # packed node keys: every node column here is internal (output is
    # flagged ids only), so the joins/distincts key on struct<long,long>
    # instead of printf strings — no per-vertex format compute, 16-byte
    # aggregate keys on the (node, id) distinct (the widest shuffle)
    allv = N.all_vertex_nodes(arcs, id_col, vertices, packed=True)
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
# Max deadend rows for which v302 broadcasts the deadend side of its two
# joins (points into the distance join, endpoints into the connectivity
# join). 1M rows of (id, node, x, y) is ~40-60 MB serialized — cheap for
# executors with the usual 4-8 GiB; above it the joins fall back to
# shuffles. Deadends are a few % of a real road network, so the
# broadcast path is the production-shaped one.
DEADEND_BROADCAST_MAX = 1_000_000

# The one persisted intermediate a v302 run leaves behind. Kept so a
# REPEATED v302 (demo trials, re-validation sweeps) releases the prior
# run's cached deadend blocks instead of accumulating them in executor
# storage for the session lifetime; v302_release() frees the last one.
_V302_PERSISTED: list[DataFrame] = []


def v302_release() -> None:
    """Unpersist the deadend intermediate of the most recent v302 call
    (safe to call any time after its returned plan is materialized)."""
    while _V302_PERSISTED:
        try:
            _V302_PERSISTED.pop().unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass


# validate_topology's shared arc cache, released the same way (tests
# assert compositions leave ZERO lingering cached blocks — r5 #7)
_VT_PERSISTED: list[DataFrame] = []


def validate_release() -> None:
    """Unpersist everything the last validate_topology/v302 run cached.
    Call after the flagged output (and anything derived) is
    materialized; compositions should wrap in try/finally."""
    while _VT_PERSISTED:
        try:
            _VT_PERSISTED.pop().unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to free
            pass
    v302_release()


def v302_min_distance(arcs: DataFrame, min_dist: float = MIN_DISTANCE,
                      id_col: str = "segment_id",
                      vertices: str = "vertices") -> DataFrame:
    """Deadend arcs must be >= min_dist from arcs they are not connected
    to (validate_topology.py:174-233): for each deadend node, find arcs
    within min_dist, subtract arcs sharing ANY vertex-node with the
    deadend arc's endpoints, flag the deadend arc + disconnected arcs."""
    # persisted: feeds BOTH the distance join (points) and the dead-arc
    # restriction of the connectivity join below — without the persist
    # the second consumer would re-run the whole deadends lineage
    # (explode + node-count + semi-join) from scratch. The PREVIOUS
    # call's cached blocks are released here (the return value is lazy,
    # so the current ones must outlive this function).
    v302_release()
    # packed=True throughout: every node column in v302 is internal
    # (the output is flagged ids), so the deadend once-count and the
    # connectivity join all key on struct<long,long> instead of printf
    # strings — measured 1.4x on the deadend aggregation at 2M arcs
    dead = (N.deadends(arcs, id_col, vertices, packed=True)
            .withColumnRenamed(id_col, "src_id").persist())
    _V302_PERSISTED.append(dead)
    # bound-enforced broadcast decision (the PIP pattern): deadends are
    # the validation's subject and a few % of a real network, so both the
    # distance join's point side and the connectivity join's endpoint
    # side usually fit a broadcast — then the 100-TB arc side is NEVER
    # shuffled in either join. The count materializes the persisted
    # deadends once (work every consumer below needs anyway) and the
    # worst case (a pathological all-deadend network) falls back to
    # plain shuffle joins.
    n_dead = dead.count()
    small = n_dead <= DEADEND_BROADCAST_MAX
    # p_id = src_id ALONE — the deadend node key is never consumed past
    # this join, so carrying it (a ~20-char string on every k-ring-
    # exploded candidate row) would only widen the join shuffle. The two
    # endpoints of a doubly-deadend arc become two point rows with the
    # same p_id; that's fine — existence is all 302 needs, and the
    # distinct below collapses pair duplicates anyway (a min-distance
    # aggregation would be a wasted extra shuffle).
    hits = point_near_arc_pairs(
        dead.select(F.col("src_id").alias("p_id"), "x", "y"),
        arcs, min_dist, id_col=id_col, vertices=vertices,
        broadcast_points=small,
    ).select(F.col("p_id").alias("src_id"), F.col(id_col).alias("near_id"))
    # connected = arcs referencing either endpoint NODE of the source arc
    # (pts_id_lookup over ALL vertices — validate_topology.py:211-215).
    # Only DEADEND arcs can be src — restricting the endpoint side to
    # them up front shrinks this node join by the deadend fraction
    # (a few % of arcs in a real road network) instead of joining every
    # arc's endpoints against every vertex node.
    dead_ids = dead.select(F.col("src_id").alias(id_col)).distinct()
    src_end_nodes = (
        N.endpoint_nodes(arcs.join(dead_ids, id_col, "left_semi"),
                         id_col, vertices, packed=True)
        .select(F.col(id_col).alias("src_id"), "node")
    )
    # the exploded all-vertex side is NOT pre-distinct'd: (node, near_id)
    # duplicates only arise from an arc revisiting a node (rare in noded
    # data), and the pre-distinct was a full extra exchange of the widest
    # exploded set — `connected` dedups the (much smaller) join output
    # anyway. When the deadend count is small (the `small` bound above),
    # the endpoint side broadcasts and the vertex explode stays entirely
    # map-side — no vertex row is ever shuffled.
    allv = N.all_vertex_nodes(arcs, id_col, vertices, packed=True).select(
        "node", F.col(id_col).alias("near_id")
    )
    src_side = F.broadcast(src_end_nodes) if small else src_end_nodes
    connected = (src_side.join(allv, "node")
                 .select("src_id", "near_id").distinct())
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
    # explode, not union-of-selects — one consumer of the whole distance-
    # join + anti-join pipeline instead of two full recomputes
    return (
        disconnected.select(F.explode(F.array("src_id", "near_id")).alias("flagged_id"))
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
    but the composed run does NOT cache one by default: candidates are
    column-pruned (ids + endpoints + bbox, never vertex arrays) and each
    validation consumes them in ONE linear pipeline, so a persist barrier
    buys nothing (the round-2 array-carrying variant measured 2x slower
    when cached; the round-3 slim variant is fastest recomputed)."""
    # shared normalized projection across 7 validations; registered so
    # validate_release() can drop it once the flagged output is consumed
    validate_release()
    arcs = arcs.cache()
    _VT_PERSISTED.append(arcs)
    codes = codes or sorted(VALIDATIONS)
    # ONE pivot join, not 7 chained left-joins: flag sets are tiny, so
    # union them with their code, pivot to v<code> columns in one
    # aggregation, and join arcs once — the chained form stacked 7
    # sort-merge joins of the full arc set into a single action
    flags = None
    for code in codes:
        f = VALIDATIONS[code](arcs).select(
            F.col("flagged_id").alias(id_col), F.lit(code).alias("_code"))
        flags = f if flags is None else flags.unionByName(f)
    pivoted = flags.groupBy(id_col).agg(
        *[F.max(F.when(F.col("_code") == c, 1).otherwise(0)).alias(f"v{c}")
          for c in codes]
    )
    return arcs.join(pivoted, id_col, "left").fillna(
        {f"v{c}": 0 for c in codes})
