from __future__ import annotations

import numpy as np
import pytest

from egp_crn_spark.functions.polygonize_kernel import (face_checksum,
                                                       polygonize_segments,
                                                       polygonize_vertex_arrays)


def _areas(faces):
    out = []
    for f in faces:
        x, y = f[:, 0], f[:, 1]
        out.append(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2)
    return sorted(out)


def test_single_square():
    segs = [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0))]
    faces = polygonize_segments(segs)
    assert len(faces) == 1
    assert _areas(faces) == [pytest.approx(1.0)]


def test_two_cells_shared_wall():
    # 2x1 grid: three vertical walls + top/bottom
    segs = []
    for x in (0, 1, 2):
        segs.append(((x, 0), (x, 1)))
    for x0 in (0, 1):
        segs.append(((x0, 0), (x0 + 1, 0)))
        segs.append(((x0, 1), (x0 + 1, 1)))
    faces = polygonize_segments(segs)
    assert len(faces) == 2
    assert _areas(faces) == [pytest.approx(1.0), pytest.approx(1.0)]


def test_dangles_ignored():
    segs = [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0)),
            ((1, 1), (2, 2)), ((2, 2), (3, 2))]  # dangling tail
    faces = polygonize_segments(segs)
    assert len(faces) == 1


def test_nested_grid_3x3():
    segs = []
    for i in range(4):
        for j in range(3):
            segs.append(((i, j), (i, j + 1)))  # vertical
            segs.append(((j, i), (j + 1, i)))  # horizontal
    faces = polygonize_segments(segs)
    assert len(faces) == 9
    assert all(a == pytest.approx(1.0) for a in _areas(faces))


def test_polylines_input_and_checksum():
    sq1 = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    faces = polygonize_vertex_arrays([sq1])
    assert len(faces) == 1
    # checksum invariant to rotation/direction
    f = faces[0]
    rolled = np.roll(f, 2, axis=0)
    assert face_checksum(f) == face_checksum(rolled)
    assert face_checksum(f) == face_checksum(f[::-1])


def test_open_lines_no_face():
    assert polygonize_vertex_arrays([[[0, 0], [1, 0], [2, 0]]]) == []
