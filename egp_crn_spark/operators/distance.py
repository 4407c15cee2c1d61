"""Point-to-polyline distance joins — pure Column, cell-prefiltered.

The engine's replacement for every buffer(r)+intersects probe against ARC
geometry in the reference (validate_topology.py:190-197 deadend buffers;
fetch_deltas.py:196-228 NRN containment; validate_meshblock.py:143-182
snapping buffers): buffer-intersects-line ≡ point-to-segment distance <= r,
which is exact Column algebra — no polygon buffers materialized, no UDF.

Plan shape: explode arcs into segments, cover each segment's R-DILATED
bbox with Morton cells; points carry their ONE cell, join on the bigint
cell id, exact distance filter. Dilating the segment bbox by r makes the
covering one-sided — any point within r of the segment lies inside the
dilated bbox, so the point side needs NO k-ring explode (the old
symmetric design multiplied the point side 9x), and the cell resolution
decouples from r entirely: correctness no longer needs cell_size >= r,
so res becomes a pure performance knob (default cell_size ~ 4r balances
cover-cells-per-segment against candidates-per-point).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions import geomexpr as GX


def explode_segments(arcs: DataFrame, id_col: str = "segment_id",
                     vertices: str = "vertices") -> DataFrame:
    """(id, seg_idx, ax, ay, bx, by) — one row per line segment."""
    segs = arcs.select(
        F.col(id_col),
        F.posexplode(GX.segment_pairs(F.col(vertices))).alias("seg_idx", "seg"),
    )
    return segs.select(
        id_col,
        "seg_idx",
        F.element_at("seg.a", 1).alias("ax"),
        F.element_at("seg.a", 2).alias("ay"),
        F.element_at("seg.b", 1).alias("bx"),
        F.element_at("seg.b", 2).alias("by"),
    )


def _segment_cover_cells(segs: DataFrame, res: int,
                         pad: float = 0.0) -> DataFrame:
    """Explode each segment to every cell its ``pad``-dilated bbox
    touches at ``res``. With pad=r the covering is one-sided: a point
    within Euclidean r of the segment is within l-inf r of it, hence
    inside the dilated bbox, hence in a covered cell — so the point side
    of the join needs only its own single cell, no k-ring. idx_of clamps
    to the domain, so dilation past an edge is safe. Coarse cells in
    dense areas concentrate more segments per cell; the exact filter
    runs inside the join stage and skew falls to AQE/salting as usual."""
    def idx(c: Column) -> Column:
        return C.idx_of(c, res)

    return (
        segs.withColumn(
            "_ix",
            F.explode(F.sequence(idx(F.least("ax", "bx") - pad),
                                 idx(F.greatest("ax", "bx") + pad))),
        )
        .withColumn(
            "_iy",
            F.explode(F.sequence(idx(F.least("ay", "by") - pad),
                                 idx(F.greatest("ay", "by") + pad))),
        )
        .withColumn("_cell", C.cell_encode(F.col("_ix"), F.col("_iy"), res))
        .drop("_ix", "_iy")
    )


def point_segment_dist2(px: Column, py: Column, ax: Column, ay: Column,
                        bx: Column, by: Column) -> Column:
    """Squared distance point→segment — clamped projection, pure Column."""
    abx, aby = bx - ax, by - ay
    ab2 = abx * abx + aby * aby
    t_raw = ((px - ax) * abx + (py - ay) * aby) / F.when(ab2 == 0, F.lit(1.0)).otherwise(ab2)
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    cx = ax + t * abx
    cy = ay + t * aby
    return (px - cx) * (px - cx) + (py - cy) * (py - cy)


def point_near_arc_pairs(
    points: DataFrame,
    arcs: DataFrame,
    radius: float,
    id_col: str = "segment_id",
    vertices: str = "vertices",
    res: int | None = None,
    broadcast_points: bool = False,
) -> DataFrame:
    """RAW (p_id, arc id) candidate pairs within ``radius`` — exact
    predicate, but MAY repeat a pair (one row per qualifying segment ×
    cover cell). Existence-only consumers (validation 302's "is anything
    near?") should use this and fold their own distinct downstream —
    the min-distance aggregation of point_to_arc_distance_join is a
    whole extra shuffle they don't need.

    Covering: segments explode to their radius-dilated bbox cells, points
    carry ONE cell (see _segment_cover_cells — no k-ring). The default
    res targets cell_size ~ 4*radius: each short segment covers ~2x2
    dilated cells instead of the 9 k-ring cells the point side used to
    pay, and long arcs cover length/(4r) cells instead of length/r —
    measured 2.6x on the v302 2M-arc wall."""
    res = res if res is not None else C.res_for_radius(4.0 * radius)
    segs = _segment_cover_cells(
        explode_segments(arcs, id_col, vertices).drop("seg_idx"),
        res, pad=radius)
    ix, iy = C.xy_to_ixy(F.col("x"), F.col("y"), res)
    pts = points.withColumn("_cell", C.cell_encode(ix, iy, res))
    # broadcast_points: when the caller KNOWS the point side is small
    # (bound-enforced — e.g. v302 counts its deadends first), broadcasting
    # it keeps the exploded segment side entirely map-side: the arc table
    # — the 100-TB side — is never shuffled at all.
    if broadcast_points:
        pts = F.broadcast(pts)
    d2 = point_segment_dist2(F.col("x"), F.col("y"), F.col("ax"), F.col("ay"),
                             F.col("bx"), F.col("by"))
    return pts.join(segs, "_cell").withColumn("_d2", d2).filter(
        F.col("_d2") <= radius * radius
    )


def point_to_arc_distance_join(
    points: DataFrame,
    arcs: DataFrame,
    radius: float,
    id_col: str = "segment_id",
    vertices: str = "vertices",
    res: int | None = None,
) -> DataFrame:
    """All (point, arc) pairs where the point is within ``radius`` of the
    arc's geometry. ``points``: p_id, x, y. Output: p_id, arc id, dist.

    Exact (min over the arc's segments); pairs deduped by min-dist
    aggregation, one shuffle each side on the bigint cell.
    """
    cand = point_near_arc_pairs(points, arcs, radius, id_col, vertices, res)
    return (
        cand.groupBy("p_id", id_col)
        .agg(F.min("_d2").alias("_d2"), F.first("x").alias("x"), F.first("y").alias("y"))
        .withColumn("dist", F.sqrt("_d2"))
        .drop("_d2")
    )


def densify_vertices(vertices: Column, step: float) -> Column:
    """Sample points along a polyline at spacing <= ``step`` (plus all
    original vertices) — pure higher-order expressions. Used to express
    'arc within union of buffers(r)' as 'every sample within r of the
    network' (fetch_deltas.py:196-228, restore_geometry.py:96-117): exact
    to within the sampling tolerance, which the caller sets << r."""
    segs = GX.segment_pairs(vertices)
    sampled = F.transform(
        segs,
        lambda s: F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.ceil(GX.seg_length(s["a"], s["b"]) / F.lit(step)) - 1, F.lit(0)
                ),
            ),
            lambda i: F.array(
                F.element_at(s["a"], 1)
                + (F.element_at(s["b"], 1) - F.element_at(s["a"], 1))
                * i.cast("double")
                / F.greatest(F.ceil(GX.seg_length(s["a"], s["b"]) / F.lit(step)), F.lit(1)).cast("double"),
                F.element_at(s["a"], 2)
                + (F.element_at(s["b"], 2) - F.element_at(s["a"], 2))
                * i.cast("double")
                / F.greatest(F.ceil(GX.seg_length(s["a"], s["b"]) / F.lit(step)), F.lit(1)).cast("double"),
            ),
        ),
    )
    return F.concat(F.flatten(sampled), F.slice(vertices, -1, 1))


def arc_within_network_distance(
    query_arcs: DataFrame,
    network_arcs: DataFrame,
    radius: float,
    sample_step: float | None = None,
    id_col: str = "segment_id",
    vertices: str = "vertices",
) -> DataFrame:
    """For each query arc: is EVERY point of it within ``radius`` of the
    network? Returns (id, within: boolean).

    Re-expresses the reference's two-stage buffer-dissolve containment
    (fetch_deltas.py:196-228 'NRN within dissolved CRN buffers',
    restore_geometry.py:96-117 difference-is-empty): membership in the
    UNION of buffers is a min-distance predicate, so no polygon union is
    ever materialized. Sampling at ``sample_step`` (default radius/4)
    bounds the discretization error; the reference's buffer(resolution=5)
    polygons are themselves inscribed approximations of the true buffer.
    """
    step = sample_step if sample_step is not None else radius / 4.0
    samples = query_arcs.select(
        F.col(id_col).alias("q_id"),
        F.posexplode(densify_vertices(F.col(vertices), step)).alias("sample_idx", "pt"),
    ).select(
        "q_id", "sample_idx",
        F.element_at("pt", 1).alias("x"), F.element_at("pt", 2).alias("y"),
    ).withColumn("p_id", F.concat_ws("#", "q_id", "sample_idx"))

    hits = point_to_arc_distance_join(
        samples.select("p_id", "x", "y"), network_arcs, radius,
        id_col=id_col, vertices=vertices,
    ).select("p_id").distinct()

    # a sample is covered iff it appears in hits; arc within ⟺ all covered
    covered = samples.join(hits, "p_id", "left_semi").select("q_id", "p_id")
    n_total = samples.groupBy("q_id").agg(F.count("*").alias("n_samples"))
    n_cov = covered.groupBy("q_id").agg(F.count("*").alias("n_covered"))
    return (
        n_total.join(n_cov, "q_id", "left")
        .select(
            F.col("q_id").alias(id_col),
            (F.coalesce("n_covered", F.lit(0)) == F.col("n_samples")).alias("within"),
        )
    )
