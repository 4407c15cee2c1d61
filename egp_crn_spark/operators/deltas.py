"""Incremental deltas — id anti-joins + geometry-modification detection.

Re-expresses /root/reference/src/deltas/fetch_deltas.py and
src/restore_geometry.py:

- NGD additions:  new BO ids not in current CRN (fetch_deltas.py:171-172)
- NGD deletions:  current ids not in new data, minus -1 (:174-175)
- NRN modifications: NRN arcs NOT everywhere-within radius of the CRN
  road network (:196-228 two-stage buffer-dissolve containment) — here a
  single arc_within_network_distance pass (operators/distance.py):
  membership in a union of buffers IS a min-distance predicate, so the
  reference's within-probe → intersects-probe → dissolve cascade
  collapses into one cell-prefiltered distance join.
- restore-modified: same containment between a restore snapshot and the
  working layer (restore_geometry.py:96-117), plus id-based missing
  detection (:92-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .distance import arc_within_network_distance


def ngd_additions(new_df: DataFrame, crn: DataFrame, id_col: str = "ngd_uid") -> DataFrame:
    """BO rows of new data whose id is absent from CRN."""
    return (
        new_df.filter(F.col("segment_type") == 2)
        .join(crn.select(id_col).distinct(), id_col, "left_anti")
    )


def ngd_deletions(new_df: DataFrame, crn: DataFrame, id_col: str = "ngd_uid") -> DataFrame:
    """CRN rows whose id is absent from new data (id != -1), flagged."""
    return (
        crn.filter(F.col(id_col) != -1)
        .join(new_df.select(id_col).distinct(), id_col, "left_anti")
    )


def nrn_modifications(nrn: DataFrame, crn: DataFrame, radius: float = 5.0,
                      id_col: str = "segment_id") -> DataFrame:
    """NRN arcs not everywhere within ``radius`` of CRN roads — candidate
    geometry modifications (fetch_deltas.py:188-233, default radius 5)."""
    roads = crn.filter(F.col("segment_type") == 1)
    within = arc_within_network_distance(nrn, roads, radius, id_col=id_col)
    return nrn.join(within.filter(~F.col("within")).select(id_col), id_col, "left_semi")


def restore_modified(restore: DataFrame, current: DataFrame, radius: float = 0.01,
                     id_col: str = "segment_id") -> DataFrame:
    """Restore-snapshot arcs modified/deleted in the working layer
    (restore_geometry.py:96-117): not everywhere within ``radius`` of ANY
    current arc. Arcs with no current arc nearby at all are also modified
    (the reference's buffer-isna branch)."""
    within = arc_within_network_distance(restore, current, radius, id_col=id_col)
    return restore.join(
        within.filter(~F.col("within")).select(id_col), id_col, "left_semi"
    )


def missing_ids(restore: DataFrame, current: DataFrame, id_col: str) -> DataFrame:
    """Id-based missing detection (restore_geometry.py:92-94,
    validate_meshblock.py:312-337 missing-BO)."""
    return restore.join(current.select(id_col).distinct(), id_col, "left_anti")
