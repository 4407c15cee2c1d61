"""Planar face extraction (polygonize) — dependency-free half-edge tracing.

Re-implements the semantics of shapely.ops.polygonize(unary_union(arcs))
used for meshblock creation (validate_meshblock.py:360-364,
conflate_meshblock.py:70-74): given NODED segments (arcs already split at
intersections — validation 303 enforces this upstream), extract all
bounded faces of the planar subdivision.

Algorithm: classic DCEL face tracing. Each undirected segment yields two
half-edges; at every node the outgoing half-edges are sorted by angle;
the successor of half-edge (u→v) is the next outgoing edge at v rotating
CLOCKWISE from the reverse edge (v→u). Tracing yields all faces; bounded
faces come out counter-clockwise (positive signed area). Dangling edges
(trees) trace degenerate zero-area cycles and are dropped — matching
shapely polygonize ignoring dangles.
"""

from __future__ import annotations

import math

import numpy as np

ROUND = 9


def _key(x: float, y: float) -> tuple:
    return (round(x, ROUND), round(y, ROUND))


def polygonize_segments(segments) -> list[np.ndarray]:
    """segments: iterable of ((ax, ay), (bx, by)). Returns bounded faces
    as (n, 2) vertex arrays (closed implicitly, first vertex not
    repeated), CCW, sorted by (minx, miny, area) for determinism."""
    # build node-indexed half-edge sets (dedup identical segments)
    out_edges: dict[tuple, list[tuple]] = {}
    seen = set()
    for (ax, ay), (bx, by) in segments:
        a, b = _key(ax, ay), _key(bx, by)
        if a == b:
            continue
        und = (a, b) if a <= b else (b, a)
        if und in seen:
            continue
        seen.add(und)
        out_edges.setdefault(a, []).append(b)
        out_edges.setdefault(b, []).append(a)

    # sort outgoing neighbours by angle per node
    order: dict[tuple, list[tuple]] = {}
    for node, nbrs in out_edges.items():
        order[node] = sorted(
            set(nbrs), key=lambda n: math.atan2(n[1] - node[1], n[0] - node[0])
        )

    def next_half_edge(u: tuple, v: tuple) -> tuple:
        """Successor of half-edge u→v: at v, rotate clockwise from v→u."""
        nbrs = order[v]
        i = nbrs.index(u)
        return (v, nbrs[(i - 1) % len(nbrs)])

    visited: set[tuple] = set()
    faces: list[np.ndarray] = []
    for a in order:
        for b in order[a]:
            if (a, b) in visited:
                continue
            # trace the face left of a→b
            cycle = []
            u, v = a, b
            while (u, v) not in visited:
                visited.add((u, v))
                cycle.append(u)
                u, v = next_half_edge(u, v)
            if (u, v) != (a, b):
                continue  # entered an already-traced cycle midway
            pts = np.array(cycle, dtype=np.float64)
            if len(pts) < 3:
                continue
            x, y = pts[:, 0], pts[:, 1]
            area2 = float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            if area2 > 1e-12:  # CCW bounded face
                faces.append(pts)
    # deterministic order
    faces.sort(key=lambda p: (p[:, 0].min(), p[:, 1].min(), -len(p)))
    return faces


def polygonize_vertex_arrays(vertex_arrays) -> list[np.ndarray]:
    """Convenience: polylines (lists of [x, y]) → bounded faces."""
    segs = []
    for vs in vertex_arrays:
        vs = np.asarray([list(p) for p in vs], dtype=np.float64)
        for i in range(len(vs) - 1):
            segs.append(((vs[i, 0], vs[i, 1]), (vs[i + 1, 0], vs[i + 1, 1])))
    return polygonize_segments(segs)


def assign_holes(faces: list[np.ndarray]) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Attach enclosed island rings as holes of their smallest enclosing
    face — GEOS/shapely polygonize semantics for nested linework: an
    island ring inside a face yields BOTH the outer face WITH the island
    as a hole AND the island as a face of its own.

    Nesting test: rings of the same connected component tile (they share
    nodes), so ring i is a hole candidate of ring j only when their node
    sets are DISJOINT and a vertex of i lies inside j. Exact for noded
    planar subdivisions; a vertex of a disconnected island cannot lie on
    j's boundary (it would be a shared node).
    """
    from .geomkernel import points_in_polygon

    n = len(faces)
    if n < 2:
        return [(f, []) for f in faces]
    areas = np.empty(n)
    boxes = np.empty((n, 4))
    for i, f in enumerate(faces):
        x, y = f[:, 0], f[:, 1]
        areas[i] = abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0
        boxes[i] = (x.min(), y.min(), x.max(), y.max())
    # Grid-bucket prefilter (O(n) for tilings, never O(n²)): ring i can
    # only nest in ring j if j's bbox strictly contains i's, so index
    # median-sized faces into a uniform grid keyed by bbox cover cells
    # and probe with i's first vertex; oversized faces (the only ones
    # that could enclose many) are checked directly — there are few.
    ext = np.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    cell = max(float(np.median(ext)), 1e-9)
    large = [int(j) for j in np.where(ext > 4 * cell)[0]]
    grid: dict[tuple[int, int], list[int]] = {}
    for j in range(n):
        if ext[j] > 4 * cell:
            continue
        gx0, gy0 = int(boxes[j, 0] // cell), int(boxes[j, 1] // cell)
        gx1, gy1 = int(boxes[j, 2] // cell), int(boxes[j, 3] // cell)
        for gx in range(gx0, gx1 + 1):
            for gy in range(gy0, gy1 + 1):
                grid.setdefault((gx, gy), []).append(j)

    def node_key_set(i: int) -> set:
        return {(round(float(x), ROUND), round(float(y), ROUND)) for x, y in faces[i]}

    keys: dict[int, set] = {}
    holes: list[list[np.ndarray]] = [[] for _ in faces]
    for i in range(n):
        f = faces[i]
        vx, vy = float(f[0, 0]), float(f[0, 1])
        cands = grid.get((int(vx // cell), int(vy // cell)), [])
        best = None
        for j in list(cands) + large:
            if (j == i or areas[j] <= areas[i]
                    or not (boxes[j, 0] < boxes[i, 0] and boxes[j, 1] < boxes[i, 1]
                            and boxes[j, 2] > boxes[i, 2] and boxes[j, 3] > boxes[i, 3])):
                continue
            if i not in keys:
                keys[i] = node_key_set(i)
            if j not in keys:
                keys[j] = node_key_set(j)
            if keys[i] & keys[j]:
                continue  # shared nodes → same component → tiling, not nesting
            if points_in_polygon(f[:1, 0], f[:1, 1], faces[j])[0]:
                if best is None or areas[j] < areas[best]:
                    best = int(j)
        if best is not None:
            holes[best].append(f)
    return [(f, holes[i]) for i, f in enumerate(faces)]


def polygonize_with_holes(segments) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """polygonize_segments + hole assignment: [(shell, [hole rings])]."""
    return assign_holes(polygonize_segments(segments))


def face_checksum(face: np.ndarray, decimals: int = 5) -> str:
    """Rotation- and direction-insensitive checksum of a face ring (for
    cross-tile dedup of border faces)."""
    import hashlib

    pts = [(round(float(x), decimals), round(float(y), decimals)) for x, y in face]
    # canonical start = lexicographically smallest vertex; canonical
    # direction = smaller of the two rotations
    i = min(range(len(pts)), key=lambda k: pts[k])
    fwd = pts[i:] + pts[:i]
    rev = [pts[i]] + list(reversed(pts[i + 1:] + pts[:i]))
    canon = min(fwd, rev)
    raw = ";".join(f"{x}:{y}" for x, y in canon)
    return hashlib.md5(raw.encode()).hexdigest()
