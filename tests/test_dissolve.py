from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.operators.dissolve import dissolve_blocks, explode_multipart


def _cell(i, j, s=100.0):
    return [[i * s, j * s], [(i + 1) * s, j * s], [(i + 1) * s, (j + 1) * s], [i * s, (j + 1) * s]]


def test_dissolve_two_blocks(spark):
    # block 1 = 2x1 cells (L-to-R), block 2 = single cell elsewhere
    faces = spark.createDataFrame(pd.DataFrame({
        "bb_uid": [1, 1, 2],
        "vertices": [_cell(0, 0), _cell(1, 0), _cell(5, 5)],
    }))
    got = dissolve_blocks(faces).toPandas()
    areas = got.groupby("bb_uid").area.sum().to_dict()
    assert areas[1] == pytest.approx(2 * 100.0 * 100.0)
    assert areas[2] == pytest.approx(100.0 * 100.0)
    # block 1 dissolves into ONE ring with 6 boundary vertices (no interior wall)
    b1 = got[got.bb_uid == 1]
    assert len(b1) == 1
    ring = np.array([list(p) for p in b1.vertices.iloc[0]])
    # the shared wall segment (x=100 vertical) vanished; its collinear
    # boundary NODES legitimately remain (matching geopandas dissolve)
    closed = np.vstack([ring, ring[:1]])
    for a, b in zip(closed[:-1], closed[1:]):
        assert not (a[0] == 100.0 and b[0] == 100.0), "interior wall survived"


def test_dissolve_block_with_hole(spark):
    # 3x3 ring of cells around a missing center → outer ring + hole ring
    cells = [(i, j) for i in range(3) for j in range(3) if not (i == 1 and j == 1)]
    faces = spark.createDataFrame(pd.DataFrame({
        "bb_uid": [7] * len(cells),
        "vertices": [_cell(i, j) for i, j in cells],
    }))
    got = dissolve_blocks(faces).toPandas().sort_values("area", ascending=False)
    assert len(got) == 2  # outer boundary + hole ring
    assert got.area.iloc[0] == pytest.approx(9 * 100.0 * 100.0)  # outer
    assert got.area.iloc[1] == pytest.approx(1 * 100.0 * 100.0)  # hole


def test_explode_multipart(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "id": [1],
        "parts": [[[[0.0, 0.0], [1.0, 0.0]], [[2.0, 0.0], [3.0, 0.0]]]],
    }))
    got = explode_multipart(df).toPandas()
    assert len(got) == 2
    assert [list(p) for p in got.vertices.iloc[1]] == [[2.0, 0.0], [3.0, 0.0]]
