"""Vector tile clipping: kernel geometry + the length-conservation
invariant (a tile grid partitions the plane — pieces sum to the arc)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.functions.cells import cell_size, cell_to_ixy_np
from egp_crn_spark.functions.geomkernel import clip_polyline_to_box
from egp_crn_spark.operators.vectortiles import vector_tiles


def _len(line):
    return float(np.sqrt((np.diff(line, axis=0) ** 2).sum(axis=1)).sum())


def test_clip_kernel_basics():
    line = np.array([[-5.0, 5.0], [5.0, 5.0], [5.0, 15.0]])
    pieces = clip_polyline_to_box(line, 0.0, 0.0, 10.0, 10.0)
    assert len(pieces) == 1
    p = pieces[0]
    assert (p[0] == [0.0, 5.0]).all() and (p[-1] == [5.0, 10.0]).all()
    # fully outside → nothing; fully inside → identical
    assert clip_polyline_to_box(line, 20.0, 20.0, 30.0, 30.0) == []
    inside = clip_polyline_to_box(line, -10.0, 0.0, 10.0, 20.0)
    assert len(inside) == 1 and (inside[0] == line).all()
    # re-entrant path → two pieces
    zig = np.array([[1.0, 1.0], [15.0, 1.0], [15.0, 2.0], [1.0, 2.0]])
    two = clip_polyline_to_box(zig, 0.0, 0.0, 10.0, 10.0)
    assert len(two) == 2


def test_clip_conserves_length_over_grid():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = rng.integers(2, 60)
        line = rng.uniform(0.0, 100.0, (n, 2))
        total = 0.0
        for gx in range(4):
            for gy in range(4):
                for p in clip_polyline_to_box(line, gx * 25.0, gy * 25.0,
                                              (gx + 1) * 25.0,
                                              (gy + 1) * 25.0):
                    total += _len(p)
        assert total == pytest.approx(_len(line), rel=1e-9)


def test_vector_tiles_operator(spark):
    rng = np.random.default_rng(3)
    rows = [(i, [[float(x), float(y)] for x, y in
                 rng.uniform(0.0, 65536.0, (rng.integers(2, 30), 2))])
            for i in range(30)]
    arcs = spark.createDataFrame(
        rows, "arc_id long, vertices array<array<double>>")
    res = 3
    out = vector_tiles(arcs, res).toPandas()
    cs = cell_size(res)
    # every piece lies inside its tile's closed box
    for _, r in out.iterrows():
        piece = np.asarray([[p[0], p[1]] for p in r["vertices"]])
        ix, iy = cell_to_ixy_np(np.array([r["tile"]]))
        x0, y0 = float(ix[0]) * cs, float(iy[0]) * cs
        eps = 1e-9
        assert (piece[:, 0] >= x0 - eps).all() \
            and (piece[:, 0] <= x0 + cs + eps).all()
        assert (piece[:, 1] >= y0 - eps).all() \
            and (piece[:, 1] <= y0 + cs + eps).all()
    # length conservation per arc
    got = {}
    for _, r in out.iterrows():
        piece = np.asarray([[p[0], p[1]] for p in r["vertices"]])
        got[r["arc_id"]] = got.get(r["arc_id"], 0.0) + _len(piece)
    for aid, v in rows:
        want = _len(np.asarray(v))
        assert got[aid] == pytest.approx(want, rel=1e-9), aid


def test_vector_tiles_max_cover_guard(spark):
    arcs = spark.createDataFrame(
        [(1, [[0.0, 0.0], [65535.0, 65535.0]])],
        "arc_id long, vertices array<array<double>>")
    with pytest.raises(Exception, match="max_cover"):
        vector_tiles(arcs, res=8, max_cover=100).count()
