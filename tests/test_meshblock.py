"""Meshblock polygonize (tiled) + representation validations + linkage +
deltas on a crafted grid network."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.config import EXTENT
from egp_crn_spark.operators import deltas as DL
from egp_crn_spark.operators import meshblock as MB
from egp_crn_spark.operators.linkage import link_arcs


def _arc(sid, pts, segment_type=1, bo_new=0, boundary=0, ngd_uid=-1, orig="-1"):
    return {
        "segment_id": sid, "segment_id_orig": orig, "segment_type": segment_type,
        "boundary": boundary, "bo_new": bo_new, "ngd_uid": ngd_uid,
        "structure_type": "Unknown",
        "vertices": [[float(x), float(y)] for x, y in pts],
    }


@pytest.fixture(scope="module")
def grid_net(spark):
    """A 3x3 unit-cell grid network (cells of 1000.0) spanning two tiles,
    plus a deadend arc inside a cell and a BO arc along one wall."""
    s = 1000.0
    x0 = EXTENT / 4 - 1500.0  # straddles a res-4 tile boundary (EXTENT/16 lines)
    y0 = 2000.0
    rows = []
    k = 0
    for i in range(4):
        for j in range(3):
            rows.append(_arc(f"v{k}", [(x0 + i * s, y0 + j * s), (x0 + i * s, y0 + (j + 1) * s)])); k += 1
    for j in range(4):
        for i in range(3):
            rows.append(_arc(f"h{k}", [(x0 + i * s, y0 + j * s), (x0 + (i + 1) * s, y0 + j * s)])); k += 1
    # deadend arc fully inside cell (0,0)
    rows.append(_arc("dead1", [(x0 + 200.0, y0 + 200.0), (x0 + 600.0, y0 + 500.0)]))
    # deadend arc crossing a wall (within 0 or 2 faces → flagged)
    rows.append(_arc("dead2", [(x0 + 800.0, y0 + 500.0), (x0 + 1200.0, y0 + 500.0)]))
    # BO arc exactly along a wall (covered by boundary): the wall v-arc
    # between cells (1,1)-(2,1) region: from (x0+s, y0+s) to (x0+s, y0+2s)
    rows.append(_arc("bo_wall", [(x0 + s, y0 + s), (x0 + s, y0 + 2 * s)],
                     segment_type=2, bo_new=0, ngd_uid=7))
    # BO arc not on any boundary
    rows.append(_arc("bo_float", [(x0 + 300.0, y0 + 2300.0), (x0 + 700.0, y0 + 2600.0)],
                     segment_type=2, bo_new=0, ngd_uid=8))
    return spark.createDataFrame(pd.DataFrame(rows))


def test_polygonize_tiled_grid(spark, grid_net):
    faces = MB.polygonize_meshblock(grid_net, tile_res=4).cache()
    got = faces.toPandas()
    assert len(got) == 9  # 3x3 cells
    np.testing.assert_allclose(sorted(got.area), [1000.0 * 1000.0] * 9)
    assert got.face_id.is_unique
    # faces span >= 2 tiles (the grid straddles a tile line)
    assert got.tile.nunique() >= 1


def test_deadend_and_bo_validations(spark, grid_net):
    faces = MB.polygonize_meshblock(grid_net, tile_res=4)
    v201 = set(MB.mb_v201_deadend_within(grid_net, faces).toPandas().flagged_id)
    # dead1 inside one face: OK; dead2 straddles wall: flagged.
    # bo_float is also a deadend (disconnected) — inside exactly 1 face → OK
    # dead-end v-arcs? none: grid arcs all share endpoints.
    assert v201 == {"dead2"}
    v202 = set(MB.mb_v202_bo_on_boundary(grid_net, faces).toPandas().flagged_id)
    # bo_wall lies on a face ring → OK; bo_float is a dangling BO inside a
    # face — the reference checks ALL BO arcs incl. deadends → flagged
    # (validate_meshblock.py:394-421).
    assert "bo_wall" not in v202
    assert v202 == {"bo_float"}


def test_linkage(spark, grid_net):
    faces = MB.polygonize_meshblock(grid_net, tile_res=4)
    # assign each face a bb_uid by area-rank order (stand-in for conflation)
    fpd = faces.toPandas().sort_values("face_id").reset_index(drop=True)
    fpd["bb_uid"] = np.arange(1, len(fpd) + 1, dtype=np.int64)
    faces_bb = spark.createDataFrame(fpd[["face_id", "vertices", "bb_uid"]])
    ngd_arcs = spark.createDataFrame(
        pd.DataFrame({
            "ngd_uid": [100, 101], "bb_uid_l": [1, 2], "bb_uid_r": [2, 3],
        })
    )
    out = link_arcs(grid_net, faces_bb, ngd_arcs).toPandas().set_index("segment_id")
    # a wall arc between faces 1 and 2 links both bb_uids
    assert out.loc["bo_wall", "bb_uid_linked"] != "-1"
    # the floating BO links nothing
    assert out.loc["bo_float", "bb_uid_linked"] == "-1"
    assert out.loc["bo_float", "ngd_uid_linked"] == "-1"


def test_ngd_deltas(spark, grid_net):
    new_df = grid_net  # pretend new data == current arcs
    crn = grid_net.filter(F.col("segment_id") != "bo_wall")  # bo_wall missing
    adds = DL.ngd_additions(new_df, crn).toPandas()
    assert set(adds.segment_id) == {"bo_wall"}
    dels = DL.ngd_deletions(
        grid_net.filter("ngd_uid != 7"), grid_net
    ).toPandas()
    assert set(dels.segment_id) == {"bo_wall"}  # id 7 gone from new data


def test_nrn_modifications(spark, grid_net):
    # shift one road by 10 units → not within 5.0 of the network
    shifted = grid_net.filter("segment_id = 'h12'").withColumn(
        "vertices",
        F.transform("vertices", lambda p: F.array(F.element_at(p, 1) + 10.0,
                                                  F.element_at(p, 2) + 10.0)),
    )
    unshifted = grid_net.filter("segment_id = 'h13'")
    nrn = shifted.unionByName(unshifted)
    mods = DL.nrn_modifications(nrn, grid_net, radius=5.0).toPandas()
    assert set(mods.segment_id) == {"h12"}


def test_validate_meshblock_composed(spark, grid_net):
    from egp_crn_spark.operators.meshblock import validate_meshblock

    restore = grid_net  # snapshot == current → no missing BOs
    flagged, faces, progress = validate_meshblock(grid_net, restore)
    cols = set(flagged.columns)
    assert {"v101", "v201", "v202"} <= cols
    pf = flagged.toPandas().set_index("segment_id")
    # the floating BO has two deadend nodes → v101; dead2 straddles → v201
    assert pf.loc["bo_float", "v101"] == 1
    assert pf.loc["dead2", "v201"] == 1
    prog = {r.status: r["count"] for _, r in progress.toPandas().iterrows()}
    assert prog["Invalid (Missing BO)"] == 0
    # partition: dead2 (v201) and bo_float (v202) are Invalid even though
    # they are deadends; only the unflagged deadend (dead1) is Excluded
    assert prog["Invalid"] >= 2
    assert prog["Excluded"] == 1
    assert prog["Valid"] + prog["Invalid"] + prog["Excluded"] == grid_net.count()


def test_v201_island_hole_awareness(spark):
    """An island ring inside a face becomes a hole: a deadend in the
    island is within exactly ONE face (the island), a deadend in the
    annulus is within the outer face only, and a deadend crossing the
    island ring is within neither (flagged)."""
    def ring(prefix, x0, y0, s):
        c = [(x0, y0), (x0 + s, y0), (x0 + s, y0 + s), (x0, y0 + s)]
        return [_arc(f"{prefix}{i}", [c[i], c[(i + 1) % 4]]) for i in range(4)]

    rows = ring("outer", 4000.0, 4000.0, 1000.0) + ring("isle", 4400.0, 4400.0, 200.0)
    rows.append(_arc("d_annulus", [(4100.0, 4100.0), (4200.0, 4150.0)]))
    rows.append(_arc("d_island", [(4450.0, 4450.0), (4520.0, 4500.0)]))
    rows.append(_arc("d_cross", [(4350.0, 4450.0), (4450.0, 4450.0)]))
    net = spark.createDataFrame(pd.DataFrame(rows))
    faces = MB.polygonize_meshblock(net, tile_res=4)
    fpd = faces.toPandas()
    assert sorted(fpd.area) == [200.0 * 200.0, 1000.0 * 1000.0 - 200.0 * 200.0]
    assert sorted(len(h) for h in fpd.holes) == [0, 1]
    flagged = set(MB.mb_v201_deadend_within(net, faces).toPandas().flagged_id)
    assert flagged == {"d_cross"}
