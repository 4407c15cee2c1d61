"""Property-based tests (hypothesis) for the pure-python/numpy cores:
Morton cells, geometry kernels, codec, polygonize invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from egp_crn_spark.config import EXTENT
from egp_crn_spark.functions import cells as C
from egp_crn_spark.functions import geomkernel as GK
from egp_crn_spark.functions.imagecodec import decode_image, encode_image, psnr
from egp_crn_spark.functions.polygonize_kernel import polygonize_segments

coord = st.floats(min_value=0.0, max_value=EXTENT - 1e-6, allow_nan=False)
res_s = st.integers(min_value=0, max_value=16)


@given(coord, coord, res_s)
def test_cell_parent_consistency(x, y, res):
    """parent(cell(p, res), res→r) == cell(p, r) for all coarser r."""
    xs, ys = np.array([x]), np.array([y])
    fine = C.cell_of_xy_np(xs, ys, res)[0]
    for r in range(0, res + 1, max(1, res // 3) if res else 1):
        direct = C.cell_of_xy_np(xs, ys, r)[0]
        morton = fine & ((1 << C.RES_SHIFT) - 1)
        parent = (r << C.RES_SHIFT) | (morton >> (2 * (res - r)))
        assert parent == direct


@given(coord, coord, coord, coord, res_s)
def test_cell_locality(x1, y1, x2, y2, res):
    """Same cell ⇒ within one cell diagonal; k-ring coverage bound."""
    a = C.cell_of_xy_np(np.array([x1]), np.array([y1]), res)[0]
    b = C.cell_of_xy_np(np.array([x2]), np.array([y2]), res)[0]
    if a == b:
        s = C.cell_size(res)
        assert abs(x1 - x2) <= s and abs(y1 - y2) <= s


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=8, unique=True))
def test_pip_bbox_consistency(pts):
    """Points outside a polygon's bbox are never inside it."""
    poly = np.array(pts, dtype=np.float64)
    probe_x = np.array([poly[:, 0].max() + 10.0, poly[:, 0].min() - 10.0])
    probe_y = np.array([poly[:, 1].max() + 10.0, poly[:, 1].min() - 10.0])
    assert not GK.points_in_polygon(probe_x, probe_y, poly).any()


@given(st.integers(2, 30), st.integers(2, 30),
       st.sampled_from(["png", "jpeg"]), st.integers(0, 2**31 - 1))
@settings(max_examples=50)
def test_codec_roundtrip_property(h, w, fmt, seed):
    arr = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    back = decode_image(encode_image(arr, fmt))
    assert back.shape == arr.shape
    if fmt == "png":
        assert (back == arr).all()
    else:
        assert psnr(arr, back) >= 40.0


@given(st.integers(1, 5), st.integers(1, 5))
@settings(max_examples=20)
def test_polygonize_grid_count(nx, ny):
    """An (nx × ny)-cell grid polygonizes to exactly nx*ny unit faces."""
    segs = []
    for i in range(nx + 1):
        for j in range(ny):
            segs.append(((float(i), float(j)), (float(i), float(j + 1))))
    for j in range(ny + 1):
        for i in range(nx):
            segs.append(((float(i), float(j)), (float(i + 1), float(j))))
    faces = polygonize_segments(segs)
    assert len(faces) == nx * ny
    total = sum(
        abs(np.dot(f[:, 0], np.roll(f[:, 1], -1)) - np.dot(f[:, 1], np.roll(f[:, 0], -1))) / 2
        for f in faces
    )
    assert abs(total - nx * ny) < 1e-9


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=6),
       st.floats(min_value=0.1, max_value=0.9))
@settings(max_examples=50)
def test_split_preserves_length(pts, frac):
    line = np.array(pts, dtype=np.float64)
    total = GK.cum_lengths(line)[-1]
    if total <= 0:
        return
    pieces = GK.split_line_at_distances(line, [frac * total])
    got = sum(GK.cum_lengths(p)[-1] for p in pieces)
    assert abs(got - total) < 1e-6 * max(total, 1.0)


@given(
    st.floats(min_value=10.0, max_value=1000.0),
    st.floats(min_value=10.0, max_value=1000.0),
    st.lists(st.tuples(st.floats(0.05, 0.95), st.floats(0.05, 0.95)),
             min_size=2, max_size=5),
    st.floats(min_value=-5000.0, max_value=5000.0),
    st.floats(min_value=-5000.0, max_value=5000.0),
)
@settings(max_examples=60)
def test_within_polygon_invariances(w, h, rel_pts, tx, ty):
    """polyline_within_polygon: interior polylines are within; the result
    is direction-reversal invariant and translation invariant."""
    shell = np.array([(0, 0), (w, 0), (w, h), (0, h)], dtype=np.float64)
    line = np.array([(rx * w, ry * h) for rx, ry in rel_pts], dtype=np.float64)
    assert GK.polyline_within_polygon(line, shell)
    assert GK.polyline_within_polygon(line[::-1].copy(), shell)
    t = np.array([tx, ty])
    assert GK.polyline_within_polygon(line + t, shell + t)
    # push one vertex far outside → never within
    out = line.copy()
    out[0] = (-w, -h)
    assert not GK.polyline_within_polygon(out, shell)


@given(
    st.lists(st.tuples(st.floats(0.0, 500.0), st.floats(0.0, 500.0)),
             min_size=3, max_size=7, unique=True),
    st.floats(0.0, 1.0), st.integers(0, 5),
)
@settings(max_examples=60)
def test_points_on_ring_matches_edge_sampling(pts, frac, edge_i):
    """Any point sampled ON a (non-degenerate) ring edge is reported on
    the ring; the ring centroid shifted far away is not. Edges shorter
    than the kernel EPS are legitimately skipped, so degenerate rings
    are excluded."""
    from hypothesis import assume

    ring = np.array(pts, dtype=np.float64)
    d = ring - np.roll(ring, -1, axis=0)
    assume((np.hypot(d[:, 0], d[:, 1]) > 0.1).all())
    i = edge_i % len(ring)
    a, b = ring[i], ring[(i + 1) % len(ring)]
    p = a + frac * (b - a)
    assert GK.points_on_ring(np.array([p[0]]), np.array([p[1]]), ring)[0]
    far = ring.mean(axis=0) + np.array([1e6, 1e6])
    assert not GK.points_on_ring(np.array([far[0]]), np.array([far[1]]), ring)[0]
