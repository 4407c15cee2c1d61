"""Node extraction, degree, deadends, crossings — relational graph recovery.

The reference has no graph engine: the arc graph is recovered from
coordinate equality of rounded endpoints (helpers.py:306-342 rounding;
degree via duplicated()/Counter — gen_crossings.py:138-144,
validate_meshblock.py:280-281). Here: explode endpoints → groupBy node
key. Node key = the rounded coordinate pair as a string (exact equality,
no float-group hazards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import COORD_DECIMALS, CROSSING_DEGREE
from ..functions import geomexpr as GX


def node_key(pt: Column, decimals: int = COORD_DECIMALS) -> Column:
    """Canonical string key of a point — 5-decimal node identity."""
    return F.concat_ws(
        ":",
        F.format_string(f"%.{decimals}f", F.element_at(pt, 1)),
        F.format_string(f"%.{decimals}f", F.element_at(pt, 2)),
    )


def node_key_packed(pt: Column, decimals: int = COORD_DECIMALS) -> Column:
    """Packed integer node identity — struct<nx, ny> of the 5-decimal
    rounding of each coordinate, scaled to long: the SAME identity
    classes as node_key, as an equality key of two longs instead of a
    ~20-char printf string (no format compute on every vertex, fixed
    16-byte join/aggregate keys). For INTERNAL joins only — any output
    that mirrors the reference's printf node keys keeps node_key.

    One rounding rule for both key forms (ADVICE r5): printf %.Nf
    correctly rounds the double's exact value (exact decimal ties are
    not binary-representable, so its tie rule never fires);
    ``F.round(x, N)`` rounds that same exact value HALF_UP — identical
    digits. The outer round only snaps the already-N-decimal value
    scaled by 10^N onto its integer (error ~1e-11, no knife edge),
    unlike rounding ``x * 10^N`` directly, whose product can land
    exactly on .5 and diverge from printf (verified on an odd-multiple-
    of-5e-6 battery + 200k random coords: 0 mismatches)."""
    s = float(10 ** decimals)
    return F.struct(
        F.round(F.round(F.element_at(pt, 1), decimals) * s).cast("long").alias("nx"),
        F.round(F.round(F.element_at(pt, 2), decimals) * s).cast("long").alias("ny"),
    )


def endpoint_nodes(arcs: DataFrame, id_col: str = "segment_id",
                   vertices: str = "vertices",
                   packed: bool = False) -> DataFrame:
    """One row per arc endpoint: (id, node, x, y, is_start).
    ``packed=True`` keys nodes with node_key_packed (internal-join
    callers only — see node_key_packed)."""
    key = node_key_packed if packed else node_key
    v = F.col(vertices)
    ends = arcs.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(GX.start_point(v).alias("pt"), F.lit(True).alias("is_start")),
                F.struct(GX.end_point(v).alias("pt"), F.lit(False).alias("is_start")),
            )
        ).alias("e"),
    )
    return ends.select(
        id_col,
        key(F.col("e.pt")).alias("node"),
        F.element_at(F.col("e.pt"), 1).alias("x"),
        F.element_at(F.col("e.pt"), 2).alias("y"),
        F.col("e.is_start"),
    )


def all_vertex_nodes(arcs: DataFrame, id_col: str = "segment_id",
                     vertices: str = "vertices",
                     packed: bool = False) -> DataFrame:
    """One row per vertex (the reference's pts_id_lookup substrate,
    validate_topology.py:132-134): (id, node, vertex_idx, n_vertices).
    ``packed=True`` keys nodes with node_key_packed (internal-join
    callers whose node columns never reach an output)."""
    key = node_key_packed if packed else node_key
    ex = arcs.select(
        F.col(id_col),
        F.size(vertices).alias("n_vertices"),
        F.posexplode(vertices).alias("vertex_idx", "pt"),
    )
    return ex.select(
        id_col, "n_vertices", "vertex_idx", key(F.col("pt")).alias("node"),
        F.element_at("pt", 1).alias("x"), F.element_at("pt", 2).alias("y"),
    )


def node_degrees(arcs: DataFrame, id_col: str = "segment_id",
                 vertices: str = "vertices") -> DataFrame:
    """(node, x, y, degree): endpoint-incidence count per node — the
    multiset count of gen_crossings.py:141-144."""
    return (
        endpoint_nodes(arcs, id_col, vertices)
        .groupBy("node")
        .agg(F.count("*").alias("degree"), F.first("x").alias("x"), F.first("y").alias("y"))
    )


def deadends(arcs: DataFrame, id_col: str = "segment_id",
             vertices: str = "vertices", packed: bool = False) -> DataFrame:
    """Deadend endpoints: nodes appearing exactly once (the
    ~duplicated(keep=False) idiom, validate_meshblock.py:280-281).
    Returns (id, node, x, y) — id = the arc owning the deadend node.
    ``packed=True`` runs the once-count on packed node keys (1.4x at 2M
    arcs — the count groupBy is this helper's only shuffle) and returns
    the packed node column; callers that join ``node`` onward must use
    the same key form on the other side."""
    ends = endpoint_nodes(arcs, id_col, vertices, packed=packed)
    once = ends.groupBy("node").count().filter("count = 1").select("node")
    return ends.join(once, "node", "left_semi").select(id_col, "node", "x", "y")


def crossings(arcs: DataFrame, min_count: int = CROSSING_DEGREE,
              id_col: str = "segment_id", vertices: str = "vertices") -> DataFrame:
    """Routability crossings: nodes with degree >= 4 (gen_crossings.py:47,
    132-148). Returns (node, x, y, count)."""
    return (
        node_degrees(arcs, id_col, vertices)
        .filter(F.col("degree") >= min_count)
        .select("node", "x", "y", F.col("degree").alias("count"))
    )


def crossings_delta(new: DataFrame, old: DataFrame) -> DataFrame:
    """Full-outer diff of two crossings sets on exact node coordinate with
    Additions/Deletions/Modifications classification
    (gen_crossings.py:104-122). Inputs: (node, count)."""
    n = new.select("node", F.col("count").alias("count_new"))
    o = old.select("node", F.col("count").alias("count_old"))
    j = n.join(o, "node", "full_outer")
    status = (
        F.when(F.col("count_old").isNull(), "Additions")
        .when(F.col("count_new").isNull(), "Deletions")
        .when(F.col("count_new") != F.col("count_old"), "Modifications")
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "node",
            F.coalesce("count_new", F.lit(0)).alias("count"),
            F.coalesce("count_old", F.lit(0)).alias("count_old"),
            "status",
        )
    )
