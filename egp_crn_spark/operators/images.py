"""Multimodal (image) operators — Arrow-batched plumbing over binary columns.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt) per
BASELINE.json input_hint. The Spark-side plumbing — schemas, mapInPandas
batch shapes, per-tile applyInPandas grouping, PSNR verification — is
REAL and tested; the byte-level codec is the deterministic stand-in of
functions/imagecodec.py (no PIL in this container; swap encode/decode
there for real formats, callers are unaffected).

Reference parity: the egp-crn graft's raster↔vector tile materialization
(BASELINE.json north_star): decode image bytes per Morton tile, verify
decoded-pixel allclose (PSNR >= 40 dB lossy) + exact caption equality.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells as C
from ..functions.georef import phash_x, phash_y
from ..functions.imagecodec import decode_image, encode_image, psnr, resize_nearest

META_SCHEMA = "image_id string, w int, h int, channels int, lossless boolean, mean_px double"


def decode_meta(images: DataFrame) -> DataFrame:
    """Decode every image, return shape/statistics — the basic decode op."""
    cols = ["image_id", "bytes"]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr = decode_image(bytes(data))
                rows.append(
                    (iid, arr.shape[1], arr.shape[0], arr.shape[2],
                     bytes(data)[:4] == b"FPN1", float(arr.mean()))
                )
            yield pd.DataFrame(rows, columns=["image_id", "w", "h", "channels",
                                              "lossless", "mean_px"])

    return images.select(*cols).mapInPandas(run, schema=META_SCHEMA)


def resize_images(images: DataFrame, out_h: int, out_w: int,
                  fmt: str = "png") -> DataFrame:
    """Decode → nearest-neighbour resize → re-encode; returns
    (image_id, bytes, w, h, fmt)."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr = decode_image(bytes(data))
                rs = resize_nearest(arr, out_h, out_w)
                out.append((iid, encode_image(rs, fmt), out_w, out_h, fmt))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h", "fmt"])

    return images.select("image_id", "bytes").mapInPandas(
        run, schema="image_id string, bytes binary, w int, h int, fmt string"
    )


def extract_features(images: DataFrame, grid: int = 4) -> DataFrame:
    """Cheap deterministic visual features: grid-pooled mean intensities
    as array<double> (embedding-like; feeds the similarity operators)."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr = decode_image(bytes(data)).astype(np.float64)
                h, w = arr.shape[:2]
                pooled = [
                    float(arr[i * h // grid:(i + 1) * h // grid,
                              j * w // grid:(j + 1) * w // grid].mean())
                    for i in range(grid) for j in range(grid)
                ]
                ids.append(iid)
                feats.append(pooled)
            yield pd.DataFrame({"image_id": ids, "feature": feats})

    return images.select("image_id", "bytes").mapInPandas(
        run, schema="image_id string, feature array<double>"
    )


def frame_sample(frames: DataFrame, every: int = 5,
                 id_col: str = "video_id", idx_col: str = "frame_idx") -> DataFrame:
    """Frame sampling for video-like tables (video_id, frame_idx, bytes):
    keep every Nth frame per video — pure Column, no decode."""
    return frames.filter(F.pmod(F.col(idx_col), F.lit(every)) == 0)


def tile_roundtrip_report(images: DataFrame, tile_res: int = 4,
                          min_psnr: float = 40.0) -> DataFrame:
    """Per-tile raster materialization + verification: group images by
    Morton tile (phash georef), decode each, re-encode, decode again and
    verify PSNR >= min_psnr (lossy) or exactness (lossless) + caption
    equality. Returns one row per tile: counts + min PSNR observed.

    This is the BASELINE.json tile-materialization check as a distributed
    applyInPandas over the tile grouping."""
    tiled = images.select(
        "image_id", "bytes", "fmt", "caption",
        C.cell_of_xy(phash_x(F.col("phash")), phash_y(F.col("phash")), tile_res).alias("tile"),
    )

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        n_ok = 0
        n_fail = 0
        worst = float("inf")
        for data, fmt, caption in zip(pdf["bytes"], pdf["fmt"], pdf["caption"]):
            arr = decode_image(bytes(data))
            # (1) own-format roundtrip: exact for lossless, PSNR-gated lossy
            rt = decode_image(encode_image(arr, str(fmt)))
            ok = (rt == arr).all() if fmt == "png" else psnr(arr, rt) >= min_psnr
            ok = ok and isinstance(caption, str)  # caption carried exactly
            n_ok += int(ok)
            n_fail += int(not ok)
            # (2) lossy re-encode distortion of the decoded pixels — the
            # cost of JPEG-ifying this tile (finite for lossless sources;
            # inf where lossy re-encode is idempotent, as with the
            # stand-in quantizer, so it never drags the minimum down)
            worst = min(worst, psnr(arr, decode_image(encode_image(arr, "jpeg"))))
        return pd.DataFrame(
            {"tile": [int(pdf["tile"].iloc[0])], "n_images": [len(pdf)],
             "n_ok": [n_ok], "n_fail": [n_fail],
             "min_psnr": [worst if np.isfinite(worst) else -1.0]}
        )

    return tiled.groupBy("tile").applyInPandas(
        per_tile, schema="tile long, n_images long, n_ok long, n_fail long, min_psnr double"
    )


def phash_near_dup(images: DataFrame, phash_col: str = "phash",
                   id_col: str = "image_id", max_hamming: int = 3,
                   max_bucket: int = 1000) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash hamming distance —
    the image-payload twin of text simhash dedup: the input table
    already carries a 64-bit phash per image (BASELINE.json input_hint
    schema), so candidate generation is the banded pigeonhole bucket
    join and verification is bit_count(xor), all JVM-side Column algebra
    (operators/dedup.hamming_near_pairs). Returns (a_id, b_id, hamming).

    At 10^12 images the banding is what makes this tractable: buckets
    are 64/(max_hamming+1)-bit prefixes, the join keys on (band, bucket)
    bigints, and the measured bucket cap drops degenerate mega-buckets
    (e.g. solid-color images hashing identically) with an audit path —
    never an all-pairs comparison."""
    from .dedup import hamming_near_pairs

    sig = images.select(F.col(id_col), F.col(phash_col).cast("long").alias("sh"))
    return hamming_near_pairs(sig, "sh", id_col, max_hamming, max_bucket)
