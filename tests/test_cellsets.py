from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.functions import cells as C
from egp_crn_spark.operators.cellsets import (cell_res, compact_cells,
                                              join_points_to_multires_cells,
                                              uncompact_cells)


def _cell(ix, iy, res):
    return int(C.cell_encode_np(np.array([ix]), np.array([iy]), res)[0])


def test_compact_full_square(spark):
    # all 16 res-3 cells of one res-1 cell → compacts to the res-1 cell
    cells = [_cell(ix, iy, 3) for ix in range(4) for iy in range(4)]
    df = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    got = sorted(r.cell for r in compact_cells(df).collect())
    assert got == [_cell(0, 0, 1)]


def test_compact_partial(spark):
    # 3 of 4 siblings + an unrelated cell → nothing compacts
    cells = [_cell(0, 0, 3), _cell(1, 0, 3), _cell(0, 1, 3), _cell(7, 7, 3)]
    df = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    got = sorted(r.cell for r in compact_cells(df).collect())
    assert got == sorted(cells)


def test_uncompact_roundtrip(spark):
    cells = [_cell(0, 0, 1), _cell(3, 2, 2)]
    df = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    got = sorted(r.cell for r in uncompact_cells(df, target_res=3).collect())
    want = sorted(
        [_cell(ix, iy, 3) for ix in range(4) for iy in range(4)]
        + [_cell(3 * 2 + dx, 2 * 2 + dy, 3) for dx in range(2) for dy in range(2)]
    )
    assert got == want
    # compact(uncompact(x)) == x
    back = sorted(
        r.cell for r in compact_cells(
            uncompact_cells(df, target_res=4)).collect()
    )
    assert back == sorted(cells)


def test_join_multires(spark):
    # compacted set: one res-1 cell + one res-3 cell; points at res 3
    cellset = spark.createDataFrame(pd.DataFrame({
        "cell": [_cell(0, 0, 1), _cell(7, 7, 3)],
    }))
    pts = spark.createDataFrame(pd.DataFrame({
        "p": [1, 2, 3],
        "_pt_cell": [_cell(2, 3, 3),   # inside the res-1 cell (ix,iy < 4)
                     _cell(7, 7, 3),   # the res-3 cell itself
                     _cell(6, 0, 3)],  # in neither
    }))
    got = sorted(r.p for r in join_points_to_multires_cells(pts, cellset, 3).collect())
    assert got == [1, 2]
    res_vals = [r[0] for r in cellset.select(cell_res(F.col("cell"))).collect()]
    assert sorted(res_vals) == [1, 3]
