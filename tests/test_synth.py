from __future__ import annotations

import numpy as np
import pandas as pd

from egp_crn_spark.config import EXTENT
from egp_crn_spark.functions.imagecodec import decode_image, psnr
from egp_crn_spark.synth import image_array_for, make_boundaries, make_images


def test_images_schema_and_determinism():
    a = make_images(200, seed=42)
    b = make_images(200, seed=42)
    assert list(a.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    pd.testing.assert_frame_equal(a.drop(columns="bytes"), b.drop(columns="bytes"))
    assert a.bytes.iloc[0] == b.bytes.iloc[0]
    assert a.image_id.str.len().eq(32).all()
    assert set(a.fmt.unique()) == {"png", "jpeg"}


def test_images_payload_decodes_with_psnr():
    df = make_images(50, seed=42)
    for i, row in df.iterrows():
        arr = decode_image(row["bytes"])
        assert arr.shape == (row.h, row.w, 3)
        ref = image_array_for(i, row.h, row.w, seed=42)
        if row.fmt == "png":
            assert (arr == ref).all()
        else:
            assert psnr(ref, arr) >= 40.0


def test_images_have_skew_and_duplicates():
    df = make_images(1000, seed=42)
    ix = (df.phash.values >> 32) & 0xFFFFFFFF
    iy = df.phash.values & 0xFFFFFFFF
    # duplicates exist
    assert df.phash.duplicated().any()
    # skew: top-1% of res-8 cells hold >= 15% of rows
    cell = (ix >> 24 << 8) | (iy >> 24)
    counts = pd.Series(cell).value_counts()
    top = counts.head(max(1, len(counts) // 100)).sum()
    assert top / len(df) >= 0.15


def test_boundaries_are_convex_partition():
    df = make_boundaries(res=3, seed=42)
    assert len(df) == 64
    total = 0.0
    for vs in df.vertices:
        p = np.array(vs)
        # convexity: all cross products same sign
        d = np.roll(p, -1, axis=0) - p
        cross = d[:, 0] * np.roll(d, -1, axis=0)[:, 1] - d[:, 1] * np.roll(d, -1, axis=0)[:, 0]
        assert (cross >= 0).all() or (cross <= 0).all()
        x, y = p[:, 0], p[:, 1]
        total += abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2
    assert abs(total - EXTENT * EXTENT) / (EXTENT * EXTENT) < 1e-9
