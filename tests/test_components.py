"""Connected components / canonical dedup — vs a Python union-find
oracle, plus transitivity and end-to-end planted-family cases."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.operators.components import (connected_components,
                                                dedup_keep_canonical)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member of each set
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def test_cc_chain_transitive(spark):
    """a-b, b-c, c-d: one component even though a!~c directly — the case
    pairwise dedup alone gets wrong (diameter 3 needs >1 iteration)."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": [1, 2, 3], "b_id": [2, 3, 4]}))
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cc_matches_union_find(spark):
    """Seeded random graph vs the in-memory union-find oracle."""
    import random

    rng = random.Random(7)
    nodes = list(range(60))
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(set(n for e in edges for n in e), edges)
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": [a for a, _ in edges],
                      "b_id": [b for _, b in edges]}))
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == want


def test_dedup_keep_canonical_planted_families(spark):
    """End to end: phash near-dup pairs -> clusters -> keep exactly the
    min id per family; singletons untouched."""
    from egp_crn_spark.operators.dedup import hamming_near_pairs

    def i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    base_a, base_b = 0x5A5A5A5A5A5A5A5A, 0x0123456789ABCDEF
    rows = {
        # family A: 1~2 (1 bit), 2~3 (2 bits), 1!~3 (3 bits) — transitive
        1: i64(base_a), 2: i64(base_a ^ (1 << 3)),
        3: i64(base_a ^ (1 << 3) ^ (1 << 40) ^ (1 << 50)),
        # family B: exact dup pair
        10: i64(base_b), 11: i64(base_b),
        # singleton
        20: i64(base_a ^ 0xFF00FF),
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(rows), "phash": list(rows.values())}))
    pairs = hamming_near_pairs(df, "phash", "doc_id", max_hamming=2)
    got = sorted(r.doc_id for r in
                 dedup_keep_canonical(df, pairs, "doc_id").collect())
    assert got == [1, 10, 20]


def test_cc_long_chain_logarithmic_rounds(spark):
    """A 100-link chain (diameter 100) must converge well inside
    max_iter=10 — the per-round pointer jump makes rounds ~ log2(d),
    where plain one-hop propagation would need ~100 rounds and raise."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": list(range(100)), "b_id": list(range(1, 101))}))
    got = {r.node: r.component
           for r in connected_components(pairs, max_iter=10).collect()}
    assert got == {n: 0 for n in range(101)}


def test_cc_raises_on_exhaustion(spark):
    """Exhausting max_iter with labels still moving must raise, not
    silently return fragmented clusters (ADVICE r5)."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": list(range(30)), "b_id": list(range(1, 31))}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_cc_reliable_checkpoint(spark, tmp_path):
    """reliable=True routes through reliable-storage checkpoint():
    requires a checkpoint dir (raises without) and returns the same
    components as the localCheckpoint path."""
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": [1, 2, 3], "b_id": [2, 3, 4]}))
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            connected_components(pairs, reliable=True)
    sc.setCheckpointDir(str(tmp_path / "chk"))
    got = {r.node: r.component
           for r in connected_components(pairs, reliable=True).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
