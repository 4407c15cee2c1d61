"""Morton cell index: Column builders vs numpy twins vs SQL emitters."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from egp_crn_spark.config import EXTENT
from egp_crn_spark.functions import cells


def _ref_interleave(ix: int, iy: int) -> int:
    out = 0
    for b in range(16):
        out |= ((ix >> b) & 1) << (2 * b)
        out |= ((iy >> b) & 1) << (2 * b + 1)
    return out


def test_spread_bits_np_matches_bit_loop():
    rng = np.random.default_rng(0)
    ix = rng.integers(0, 1 << 16, 200)
    iy = rng.integers(0, 1 << 16, 200)
    got = cells.cell_encode_np(ix, iy, 16)
    want = np.array([(16 << cells.RES_SHIFT) | _ref_interleave(a, b) for a, b in zip(ix, iy)])
    assert (got == want).all()


def test_column_encode_matches_numpy(spark):
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({
        "x": rng.uniform(0, EXTENT, 500),
        "y": rng.uniform(0, EXTENT, 500),
    })
    for res in (0, 5, 10, 16):
        df = spark.createDataFrame(pdf).select(
            cells.cell_of_xy(F.col("x"), F.col("y"), res).alias("c")
        )
        got = np.array([r.c for r in df.collect()])
        want = cells.cell_of_xy_np(pdf.x.values, pdf.y.values, res)
        assert (got == want).all(), res


def test_sql_emitter_matches_numpy():
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({
        "x": rng.uniform(0, EXTENT, 300),
        "y": rng.uniform(0, EXTENT, 300),
    })
    for res in (3, 9, 14):
        sql = f"select {cells.cell_of_xy_sql('x', 'y', res)} as c from pdf"
        got = duckdb.sql(sql).df().c.values
        want = cells.cell_of_xy_np(pdf.x.values, pdf.y.values, res)
        assert (got == want).all(), res


def test_parent_cell(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "x": rng.uniform(0, EXTENT, 200),
        "y": rng.uniform(0, EXTENT, 200),
    })
    df = spark.createDataFrame(pdf).select(
        cells.parent_cell(cells.cell_of_xy(F.col("x"), F.col("y"), 10), 10, 6).alias("p"),
        cells.cell_of_xy(F.col("x"), F.col("y"), 6).alias("direct"),
    )
    rows = df.collect()
    assert all(r.p == r.direct for r in rows)


def test_kring_contains_all_near_cells(spark):
    # any point within cell_size(res) of another must share a k=1 ring cell
    res = 8
    size = cells.cell_size(res)
    pdf = pd.DataFrame({"x": [100.0, 100.0 + size * 0.99], "y": [200.0, 200.0 + size * 0.99]})
    df = spark.createDataFrame(pdf)
    ix, iy = cells.xy_to_ixy(F.col("x"), F.col("y"), res)
    rows = df.select(
        cells.cell_of_xy(F.col("x"), F.col("y"), res).alias("own"),
        cells.kring_cells(ix, iy, res, 1).alias("ring"),
    ).collect()
    # the second point's own cell must appear in the first point's ring
    assert rows[1].own in rows[0].ring
    assert rows[0].own in rows[0].ring  # ring includes self


def test_res_for_radius():
    r = cells.res_for_radius(5.0)
    assert cells.cell_size(r) >= 5.0
    assert r == 13  # 65536/2^13 = 8 >= 5; 2^14 -> 4 < 5


def test_cells_covering_bbox():
    got = cells.cells_covering_bbox(0.0, 0.0, cells.cell_size(4) * 1.5, cells.cell_size(4) * 0.5, 4)
    assert len(got) == 2  # two cells in x, one in y


def test_morton_decode_roundtrip():
    """cell_to_ixy_np inverts cell_encode_np at every resolution tier
    (the vector-tile clip derives tile boxes from cell ids with it)."""
    import numpy as np

    ix = np.arange(0, 65536, 97, dtype=np.int64)
    iy = (ix * 7919) % 65536
    for res in (0, 4, 10, 16):
        n = 1 << res
        a, b = ix % n, iy % n
        enc = cells.cell_encode_np(a, b, res)
        ra, rb = cells.cell_to_ixy_np(enc)
        assert (ra == a).all() and (rb == b).all()
