"""Deterministic synthetic fixtures (FIXTURES.md): images, boundaries, arcs.

Seeded numpy only — no wall clock, no uuid4 (the reference's uuid4 at
/root/reference/src/helpers.py:584 is replaced by content hashes for
reproducibility). Written as parquet via pyarrow; the engine reads them
with spark.read.parquet through sources/tables.py.

The images table matches BASELINE.json input_hint exactly:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). phash values are crafted so the
phash->(x,y) bit-slice yields: dense hot cells (skew), tile-boundary
straddlers, isolated points, and exact-duplicate coordinates
(duplicate-geometry analogue).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from .config import EXTENT
from .functions.imagecodec import encode_image

AXIS_MOD = 1 << 32


def _ids(prefix: str, n: int, seed: int) -> list[str]:
    return [
        hashlib.sha256(f"{prefix}-{seed}-{i}".encode()).hexdigest()[:32] for i in range(n)
    ]


# ------------------------------------------------------------------ images
def make_images(
    n: int = 2000, seed: int = 42, with_bytes: bool = True, fast_ids: bool = False
) -> pd.DataFrame:
    """fast_ids=True replaces per-row sha256 ids/captions with vectorized
    hex ids — for multi-million-row bench fixtures only (content-hash ids
    are the fixture contract for correctness tests, FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)

    n_hot = int(n * 0.20)      # skew: 20% of rows in a handful of dense cells
    n_dup = max(int(n * 0.05), 4)  # exact-duplicate coordinates
    n_edge = max(int(n * 0.02), 4)  # tile-boundary straddlers
    n_iso = max(int(n * 0.01), 2)   # isolated points (deadend analogue)
    n_bulk = n - n_hot - n_dup - n_edge - n_iso

    ix = np.empty(n, dtype=np.int64)
    iy = np.empty(n, dtype=np.int64)

    # bulk: uniform
    ix[:n_bulk] = rng.integers(0, AXIS_MOD, n_bulk)
    iy[:n_bulk] = rng.integers(0, AXIS_MOD, n_bulk)
    o = n_bulk

    # hot clusters: 5 "urban" centers, tight spread (~ one res-10 cell)
    centers = rng.integers(AXIS_MOD // 8, 7 * AXIS_MOD // 8, size=(5, 2))
    which = rng.integers(0, 5, n_hot)
    spread = AXIS_MOD // (1 << 10)
    ix[o : o + n_hot] = centers[which, 0] + rng.integers(-spread, spread, n_hot)
    iy[o : o + n_hot] = centers[which, 1] + rng.integers(-spread, spread, n_hot)
    o += n_hot

    # boundary straddlers: just either side of res-6 tile lines
    line = rng.integers(1, 1 << 6, n_edge) * (AXIS_MOD // (1 << 6))
    side = rng.integers(0, 2, n_edge) * 2 - 1
    ix[o : o + n_edge] = line + side  # one integer step off the boundary
    iy[o : o + n_edge] = rng.integers(0, AXIS_MOD, n_edge)
    o += n_edge

    # isolated points: far corners
    ix[o : o + n_iso] = rng.integers(0, AXIS_MOD // 64, n_iso)
    iy[o : o + n_iso] = rng.integers(63 * AXIS_MOD // 64, AXIS_MOD, n_iso)
    o += n_iso

    # exact duplicates of earlier rows
    src = rng.integers(0, o, n_dup)
    ix[o:] = ix[src]
    iy[o:] = iy[src]

    ix = np.clip(ix, 0, AXIS_MOD - 1)
    iy = np.clip(iy, 0, AXIS_MOD - 1)
    phash = (ix << 32) | iy

    fmts = np.where(rng.integers(0, 2, n) == 0, "png", "jpeg")
    ws = rng.integers(8, 33, n).astype(np.int32)
    hs = rng.integers(8, 33, n).astype(np.int32)

    payloads: list[bytes | None] = []
    if with_bytes:
        for i in range(n):
            arr = image_array_for(i, int(hs[i]), int(ws[i]), seed)
            payloads.append(encode_image(arr, str(fmts[i])))
    else:
        payloads = [None] * n

    if fast_ids:
        idx = np.arange(n)
        ids = pd.Series(idx).map("img{:027x}".format).astype(str)
        captions = ("caption-" + pd.Series(idx).astype(str)).where(idx % 97 != 0, "")
    else:
        tokens = ["alpha", "β-utf8", "gamma", ""]
        ids = _ids("img", n, seed)
        captions = [
            "" if i % 97 == 0 else f"caption-{i}-{tokens[i % len(tokens)]}" for i in range(n)
        ]

    return pd.DataFrame(
        {
            "image_id": ids,
            "bytes": payloads,
            "w": ws,
            "h": hs,
            "fmt": fmts,
            "caption": captions,
            "phash": phash.astype(np.int64),
        }
    )


def image_array_for(i: int, h: int, w: int, seed: int = 42) -> np.ndarray:
    """Deterministic pixel content for row i (independent rng stream)."""
    r = np.random.default_rng(seed * 1_000_003 + i)
    return r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------------ boundaries
def make_boundaries(res: int = 4, jitter: float = 0.15, seed: int = 42) -> pd.DataFrame:
    """Convex quad tiles over the domain: a jittered grid (Voronoi-like).

    Analogue of the NGD meshblock polygon layer
    (conform_deltas_src.py:119: [bb_uid, geometry]). Jitter moves interior
    grid corners by < ``jitter`` * cell so quads remain convex; domain
    edges stay pinned so tiles partition [0, EXTENT)^2 exactly.
    """
    rng = np.random.default_rng(seed + 7)
    n = 1 << res
    cell = EXTENT / n
    # corner lattice (n+1)^2, interior corners jittered
    gx, gy = np.meshgrid(np.arange(n + 1) * cell, np.arange(n + 1) * cell, indexing="ij")
    jx = rng.uniform(-jitter, jitter, gx.shape) * cell
    jy = rng.uniform(-jitter, jitter, gy.shape) * cell
    jx[0, :] = jx[-1, :] = 0.0
    jx[:, 0] = jx[:, -1] = 0.0
    jy[0, :] = jy[-1, :] = 0.0
    jy[:, 0] = jy[:, -1] = 0.0
    cx, cy = gx + jx, gy + jy

    rows = []
    uid = 1
    for i in range(n):
        for j in range(n):
            quad = [
                [cx[i, j], cy[i, j]],
                [cx[i + 1, j], cy[i + 1, j]],
                [cx[i + 1, j + 1], cy[i + 1, j + 1]],
                [cx[i, j + 1], cy[i, j + 1]],
            ]
            rows.append({"bb_uid": uid, "vertices": quad})
            uid += 1
    return pd.DataFrame(rows)


def make_grid_rects(res: int) -> pd.DataFrame:
    """Axis-aligned grid rectangles (the CRN-face analogue for the
    conflation fast path): rect_id, xmin, ymin, xmax, ymax."""
    n = 1 << res
    cell = EXTENT / n
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    return pd.DataFrame(
        {
            "rect_id": (ii * n + jj + 1).astype(np.int64),
            "xmin": ii * cell,
            "ymin": jj * cell,
            "xmax": (ii + 1) * cell,
            "ymax": (jj + 1) * cell,
        }
    )


# ------------------------------------------------------------------ arcs
def make_arcs(n_random: int = 200, seed: int = 42) -> pd.DataFrame:
    """Arc table with every edge case the validations need (FIXTURES.md §3).

    Node coordinates snap to a lattice so shared endpoints (degree>=2)
    arise exactly — mirrors the reference recovering the graph from
    5-decimal-rounded coordinate equality (helpers.py:306-342).
    """
    rng = np.random.default_rng(seed + 13)
    lattice = EXTENT / 256.0

    def node(i: int, j: int) -> list[float]:
        return [i * lattice, j * lattice]

    arcs: list[dict] = []

    def add(vertices, segment_type=1, boundary=0, bo_new=0, ngd_uid=-1,
            structure_type="Unknown", tag="case"):
        arcs.append(
            {
                "segment_type": segment_type,
                "boundary": boundary,
                "bo_new": bo_new,
                "ngd_uid": ngd_uid,
                "structure_type": structure_type,
                "vertices": [[float(a), float(b)] for a, b in vertices],
                "tag": tag,
            }
        )

    # -- deterministic edge cases ------------------------------------
    # degree-4 node at (10,10): four spokes → routability crossing
    c = node(10, 10)
    for di, dj in [(1, 0), (-1, 0), (0, 1), (0, -1)]:
        add([c, node(10 + di, 10 + dj)], tag="deg4")
    # deadend < 5 m from another arc (validation 102 trigger)
    base = node(20, 20)
    add([base, node(22, 20)], tag="v102_base")
    add([[base[0] + 2.0, base[1] + 3.0], [base[0] + 2.0, base[1] + 40.0]], tag="v102_close_deadend")
    # deadend far from everything (isolated)
    add([node(40, 40), node(41, 40)], tag="isolated")
    # exact duplicate pair + reversed duplicate (validation 201)
    dup = [node(30, 30), node(31, 30), node(31, 31)]
    add(dup, tag="dup_a")
    add(dup, tag="dup_b")
    add(dup[::-1], tag="dup_rev")
    # overlapping (shared sub-segment, not equal) arcs (validation 202)
    add([node(50, 50), node(52, 50)], tag="ovl_a")
    add([node(51, 50), node(53, 50)], tag="ovl_b")
    # crossing arcs (validation 303)
    add([node(60, 60), node(62, 62)], tag="cross_a")
    add([node(60, 62), node(62, 60)], tag="cross_b")
    # self-crossing (non-simple, validation 101): bowtie
    p = node(70, 70)
    add([p, [p[0] + 2 * lattice, p[1] + 2 * lattice], [p[0] + 2 * lattice, p[1]],
         [p[0], p[1] + 2 * lattice]], tag="v101_bowtie")
    # cluster tolerance: adjacent vertices closer than 0.01 (validation 103)
    q = node(80, 80)
    add([q, [q[0] + 0.004, q[1]], [q[0] + lattice, q[1]]], tag="v103_cluster")
    # zero-length arc (cleaning target)
    z = node(90, 90)
    add([z, z], tag="zero_len")
    # null-coordinate vertex (cleaning target)
    add([node(95, 95), [float("nan"), float("nan")], node(96, 95)], tag="null_coord")
    # near-snap endpoints: endpoint 0.05 from a node (snap_prox 0.1)
    s = node(100, 100)
    add([s, node(101, 100)], tag="snap_target")
    add([[s[0] + 0.05, s[1] + 0.03], node(100, 101)], tag="snap_candidate")
    # boundary arc with 0.005 offset (boundary snap_prox 0.01)
    b = node(110, 110)
    add([b, node(111, 110)], boundary=1, tag="bsnap_target")
    add([[b[0] + 0.005, b[1]], node(110, 111)], boundary=1, segment_type=2, tag="bsnap_candidate")

    # -- bulk random connected chains --------------------------------
    for _ in range(n_random):
        i, j = int(rng.integers(120, 250)), int(rng.integers(2, 250))
        length = int(rng.integers(1, 4))
        pts = [node(i, j)]
        for _ in range(length):
            di, dj = int(rng.integers(-1, 2)), int(rng.integers(-1, 2))
            if di == 0 and dj == 0:
                di = 1
            i, j = i + di, j + dj
            pts.append(node(i, j))
        add(pts, segment_type=int(rng.integers(1, 3)),
            structure_type=str(rng.choice(["Unknown", "Bridge", "Tunnel", "bad-value"])),
            ngd_uid=int(rng.integers(-1, 500)), tag="bulk")

    df = pd.DataFrame(arcs)
    n = len(df)
    df.insert(0, "segment_id", _ids("arc", n, seed))
    # segment_id_orig: NRN-sourced arcs have 32-hex originals, others "-1"
    orig = _ids("orig", n, seed + 1)
    df.insert(1, "segment_id_orig", [
        orig[i] if i % 3 == 0 else "-1" for i in range(n)
    ])
    return df


# ------------------------------------------------------------------ writer
def write_fixtures(out_dir: str, n_images: int = 2000, seed: int = 42) -> dict[str, str]:
    """Write all fixture tables as parquet; returns {name: path}."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    out: dict[str, str] = {}

    images = make_images(n_images, seed)
    img_schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    out["images"] = os.path.join(out_dir, "images.parquet")
    pq.write_table(pa.Table.from_pandas(images, schema=img_schema, preserve_index=False),
                   out["images"])

    for name, df in {
        "boundaries": make_boundaries(seed=seed),
        "grid_rects": make_grid_rects(res=4),
        "arcs": make_arcs(seed=seed),
    }.items():
        out[name] = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out[name])

    # previous-run snapshot for delta operators: drop ~10%, modify ~5%
    arcs = make_arcs(seed=seed)
    prev = arcs[arcs.index % 10 != 3].copy()
    mod = prev.index % 20 == 5
    prev.loc[mod, "vertices"] = prev.loc[mod, "vertices"].map(
        lambda vs: [[x + 1.5, y] for x, y in vs]
    )
    out["arcs_prev"] = os.path.join(out_dir, "arcs_prev.parquet")
    pq.write_table(pa.Table.from_pandas(prev, preserve_index=False), out["arcs_prev"])
    return out


# ------------------------------------------------------------- embeddings
def synth_vectors(spark, n: int, dim: int = 64, n_clusters: int = 256,
                  noise: float = 0.45):
    """Clustered embedding corpus generated IN SPARK (deterministic
    per-dimension xxhash64 draws — no files, no driver materialization):
    vec = latent cluster center (vec_id % n_clusters) + uniform noise.
    Uniform UNCLUSTERED data is IVF's worst case (nearest neighbours are
    nearly orthogonal and carry no cell structure) — coarse quantization
    only earns its keep when the data has geometry, which text/image
    embeddings do. Shared by tools/ann_demo.py and bench.py."""
    from pyspark.sql import functions as F

    def u(seed_col, d):
        return (F.pmod(F.xxhash64(seed_col, F.lit(d)), F.lit(2_000_001))
                .cast("double") / 1_000_000.0 - 1.0)

    cl = (F.col("vec_id") % n_clusters) * 7 + 3
    vec = F.array(*[
        u(cl, d) + F.lit(noise) * u(F.col("vec_id"), d) for d in range(dim)
    ])
    return spark.range(n).withColumnRenamed("id", "vec_id").select(
        "vec_id", vec.alias("embedding"))


if __name__ == "__main__":
    import sys

    dest = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/tiny"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    paths = write_fixtures(dest, n)
    for k, v in paths.items():
        print(k, v)
