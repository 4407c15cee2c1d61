"""Connected components over near-duplicate pair edges — the step that
turns pairwise dedup output into DROP DECISIONS.

Every near-dup operator here (minhash/simhash/phash/embedding-cosine,
operators/dedup.py, images.py) emits PAIRS (a_id, b_id). A 100-TB
dedup pipeline must then group pairs into duplicate CLUSTERS and keep
one canonical representative per cluster — pairs alone over-drop (both
members of a pair deleted) or under-drop (transitive duplicates kept:
a~b, b~c but a!~c). The reference has no analogue (single-node pandas
would just union-find in memory); this is the distributed form.

Algorithm: iterative min-label propagation (the standard Spark CC
pattern — the two-phase large-star/small-star of Kiveris et al. reduces
iteration count on high-diameter graphs; near-dup families are
shallow, so plain propagation converges in O(diameter) ~ 2-5 rounds):

    label(v) <- min(label(v), min over neighbours u of label(u))

Each iteration is one groupBy-min over the edge list joined to current
labels. Labels are localCheckpoint'ed (eager) per iteration — a cache
alone does NOT truncate the logical plan, and an untruncated iterative
plan doubles in depth per round until Catalyst analysis itself OOMs
(measured here by round ~15). The convergence check is a count of
changed labels — a driver-side action per iteration, inherent to any
fixed-point loop (GraphFrames does the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, a_col: str = "a_id",
                         b_col: str = "b_id",
                         max_iter: int = 50) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = the minimum node id reachable from it. Deterministic,
    order-insensitive. ``max_iter`` bounds the fixed-point loop (raise
    for graphs of diameter > 2^max_iter-ish; near-dup families are
    diameter <= a few)."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min of own label and every
        # neighbour's label — one join + one groupBy-min (both
        # map-side combinable); eager checkpoint truncates lineage
        nbr = (
            edges.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("component", "_old"),
                            "node")
            .filter(F.col("component") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         a_col: str = "a_id",
                         b_col: str = "b_id",
                         components: DataFrame | None = None) -> DataFrame:
    """Drop every near-duplicate except one canonical representative per
    duplicate CLUSTER (the minimum id — deterministic). Rows never named
    in ``pairs`` pass through untouched. The end-to-end form of a
    training-data dedup stage: pairs from any near-dup operator in,
    cleaned corpus out. Pass a precomputed ``components`` frame (from
    connected_components over the same pairs) to reuse one fixed-point
    run across several consumers."""
    comp = (components if components is not None
            else connected_components(pairs, a_col, b_col))
    drop = comp.filter(F.col("node") != F.col("component")) \
               .select(F.col("node").alias(id_col))
    return df.join(drop, id_col, "left_anti")
