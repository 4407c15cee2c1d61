"""CRS seam (reference conform_deltas_src.py:175 `to_crs("EPSG:3347")`):
exact planar affines as pure Columns; geodesic reprojection through an
Arrow-batched vectorized transformer (pyproj where present, a
registered deterministic transform otherwise — the Spark plumbing is
identical and is what these tests pin)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.functions import crs


@pytest.fixture()
def pts(spark):
    rng = np.random.default_rng(5)
    return spark.createDataFrame(pd.DataFrame({
        "pid": np.arange(200),
        "x": rng.uniform(-180, 180, 200),
        "y": rng.uniform(-85, 85, 200),
    }))


def test_affine_identity_and_rotation(pts):
    x2, y2 = crs.affine_transform(F.col("x"), F.col("y"))
    assert pts.select((F.col("x") != x2).cast("int").alias("d")).agg(F.sum("d")).first()[0] == 0
    # 90-degree rotation about the origin: (x, y) -> (-y, x)
    a, b, c, d, e, f = crs.rotation(90.0)
    rx, ry = crs.affine_transform(F.col("x"), F.col("y"), a, b, c, d, e, f)
    got = pts.select("pid", rx.alias("rx"), ry.alias("ry"), "x", "y").toPandas()
    np.testing.assert_allclose(got.rx, -got.y, atol=1e-9)
    np.testing.assert_allclose(got.ry, got.x, atol=1e-9)


def test_affine_stays_jvm_side(pts):
    x2, y2 = crs.affine_transform(F.col("x"), F.col("y"), 2.0, 0.0, 10.0)
    plan = pts.select(x2.alias("x2"), y2.alias("y2"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan  # codegen path, no Python boundary


def test_reproject_points_registered_transform(spark, pts):
    """Web-Mercator-shaped forward transform registered as the
    deterministic stand-in; verifies the Arrow batch plumbing and the
    closure-shipped registry (driver registration must reach workers)."""
    R = 6378137.0

    def wm(xs, ys):
        return (np.radians(xs) * R,
                R * np.log(np.tan(np.pi / 4 + np.radians(ys) / 2)))

    crs.register_transform("EPSG:4326", "EPSG:3857", wm)
    out = crs.reproject(pts, "EPSG:4326", "EPSG:3857").toPandas().set_index("pid")
    src = pts.toPandas().set_index("pid")
    ex, ey = wm(src.x.to_numpy(), src.y.to_numpy())
    np.testing.assert_allclose(out.x.to_numpy(), ex, rtol=1e-12)
    np.testing.assert_allclose(out.y.to_numpy(), ey, rtol=1e-12)
    assert list(out.columns) == list(src.columns)  # schema preserved


def test_reproject_vertices_ragged(spark):
    crs.register_transform("local", "engine", lambda xs, ys: (xs * 2.0, ys + 100.0))
    df = spark.createDataFrame(pd.DataFrame({
        "segment_id": ["a", "b", "c"],
        "vertices": [
            [[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]],
            [[5.0, 5.0], [6.0, 5.0]],
            [],
        ],
    }))
    out = {r.segment_id: [list(p) for p in r.vertices]
           for r in crs.reproject_vertices(df, "local", "engine").collect()}
    assert out["a"] == [[0.0, 100.0], [2.0, 101.0], [4.0, 100.5]]
    assert out["b"] == [[10.0, 105.0], [12.0, 105.0]]
    assert out["c"] == []


def test_reproject_unknown_pair_is_loud(spark, pts):
    try:
        import pyproj  # noqa: F401
        pytest.skip("pyproj present — real transformer path takes over")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        crs.reproject(pts, "EPSG:4326", "EPSG:99999").toPandas()
    assert "pyproj" in str(ei.value) or "register_transform" in str(ei.value)
