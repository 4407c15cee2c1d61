"""Incremental ANN-index maintenance == from-scratch rebuild, exactly
(operators/index_maintain.py over sources/snaplog.py changelogs).

The maintained live index must equal the index built fresh from the
current corpus snapshot AS A SET (ignoring the _as_of generation stamp),
for both the float32 IVF shape and the PQ shape — hence identical probe
results. Vintage sequences include appends, partition rewrites that
re-state unchanged rows (file-level changelog), and in-place vector
updates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from egp_crn_spark.operators import index_maintain as IM
from egp_crn_spark.operators.similarity import (ivf_probe, train_centroids,
                                                train_pq)
from egp_crn_spark.sources.snaplog import SnapshotLogTable

DIM = 16


def _vec(i: int, bump: int = 0):
    rng = np.random.default_rng(1000 * (i + 1) + bump)
    return [float(x) for x in rng.uniform(-1.0, 1.0, DIM)]


def _rows(ids, part, bump=0):
    return [(i, part, _vec(i, bump)) for i in ids]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id int, part string, embedding array<double>")


def _index_set(df, pq):
    cols = ["n_id", "cell", "codes"] if pq else ["n_id", "cell", "cv", "_cn"]
    out = df.select(*cols).collect()
    if pq:
        return {(r.n_id, r.cell, bytes(r.codes)) for r in out}
    return {(r.n_id, r.cell, tuple(r.cv), r._cn) for r in out}


@pytest.fixture(scope="module")
def trained(spark, tmp_path_factory):
    """Corpus table with 3 vintages + centroids/codebooks trained on v1."""
    t = SnapshotLogTable(
        spark, str(tmp_path_factory.mktemp("ann") / "corpus"),
        partition_col="part")
    s1 = t.overwrite(_df(spark, _rows(range(40), "a") + _rows(range(40, 80), "b")))
    C = train_centroids(t.read(s1), ncells=8, sample=64)
    B = train_pq(t.read(s1), C, m=4, sample=64)
    # v2: rewrite partition b — ids 40..59 updated VECTORS (bump=1),
    # 60..79 re-stated unchanged, 80..89 new in b
    s2 = t.overwrite_partitions(_df(
        spark, _rows(range(40, 60), "b", bump=1) + _rows(range(60, 80), "b")
        + _rows(range(80, 90), "b")))
    # v3: plain append in partition c
    s3 = t.append(_df(spark, _rows(range(200, 230), "c")))
    return t, C, B, (s1, s2, s3)


@pytest.mark.parametrize("pq", [False, True], ids=["float", "pq"])
def test_maintained_equals_rebuild(spark, trained, pq):
    t, C, B, (s1, s2, s3) = trained
    books = B if pq else None
    idx, tombs = IM.build_index_state(t.read(s1), C, s1, codebooks=books)
    for frm, to in [(s1, s2), (s2, s3)]:
        idx, tombs = IM.maintain_ivf_index(t, C, frm, to, idx, tombs,
                                           codebooks=books)
        live = IM.live_index(idx, tombs)
        want, _ = IM.build_index_state(t.read(to), C, to, codebooks=books)
        assert _index_set(live, pq) == _index_set(want, pq), (frm, to, pq)
    # updated ids must carry their NEW encoding (vector changed at v2)
    live = IM.live_index(idx, tombs)
    fresh, _ = IM.build_index_state(t.read(s3), C, s3, codebooks=books)
    upd_live = _index_set(live.filter(F.col("n_id") < 60).filter("n_id >= 40"), pq)
    upd_fresh = _index_set(fresh.filter(F.col("n_id") < 60).filter("n_id >= 40"), pq)
    assert upd_live == upd_fresh and len(upd_live) == 20


def test_probe_over_live_index_matches_rebuild(spark, trained):
    t, C, B, (s1, s2, s3) = trained
    idx, tombs = IM.build_index_state(t.read(s1), C, s1)
    for frm, to in [(s1, s2), (s2, s3)]:
        idx, tombs = IM.maintain_ivf_index(t, C, frm, to, idx, tombs)
    live = IM.live_index(idx, tombs)
    fresh, _ = IM.build_index_state(t.read(s3), C, s3)
    queries = t.read(s3).filter("vec_id % 10 = 0").select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    a = ivf_probe(queries, live, C, k=3, nprobe=3).collect()
    b = ivf_probe(queries, fresh, C, k=3, nprobe=3).collect()
    key = lambda r: (r.q_id, r.rank)  # noqa: E731
    assert sorted(((r.q_id, r.rank, r.n_id) for r in a)) == \
        sorted(((r.q_id, r.rank, r.n_id) for r in b))
    assert len(a) > 0


def test_dead_rows_never_eat_rank_slots(spark, trained):
    """Filtering happens before top-k: a deleted id must not appear AND
    its former rank slot must be filled by the next live neighbour."""
    t, C, B, (s1, s2, s3) = trained
    idx, tombs = IM.build_index_state(t.read(s1), C, s1)
    for frm, to in [(s1, s2), (s2, s3)]:
        idx, tombs = IM.maintain_ivf_index(t, C, frm, to, idx, tombs)
    live = IM.live_index(idx, tombs)
    k = 5
    queries = t.read(s3).filter("vec_id = 0").select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    got = ivf_probe(queries, live, C, k=k, nprobe=8).collect()
    live_ids = {r.n_id for r in live.select("n_id").collect()}
    assert all(r.n_id in live_ids for r in got)
    assert len(got) == min(k, len(live_ids) - 1)


def test_compaction_resets_state(spark, trained):
    t, C, B, (s1, s2, s3) = trained
    idx, tombs = IM.build_index_state(t.read(s1), C, s1)
    for frm, to in [(s1, s2), (s2, s3)]:
        idx, tombs = IM.maintain_ivf_index(t, C, frm, to, idx, tombs)
    n_raw = idx.count()
    live, tombs2 = IM.compact_index(idx, tombs)
    assert tombs2.count() == 0
    assert live.count() < n_raw  # dead generations physically dropped
    want, _ = IM.build_index_state(t.read(s3), C, s3)
    assert _index_set(live, False) == _index_set(want, False)
    # a post-compaction maintenance step still composes
    s4 = t.append(_df(spark, _rows(range(300, 310), "d")))
    idx2, tombs3 = IM.maintain_ivf_index(t, C, s3, s4, live, tombs2)
    want4, _ = IM.build_index_state(t.read(s4), C, s4)
    assert _index_set(IM.live_index(idx2, tombs3), False) == \
        _index_set(want4, False)


def test_streaming_ingest_then_maintain(spark, tmp_path):
    """Composition: micro-batches land in the corpus through the
    exactly-once catalog ingest (one atomic hint flip per batch), then
    the index maintains along the committed snapshot chain — the
    continuous-ingestion posture of a production ANN pipeline. Final
    live index == from-scratch rebuild of the head snapshot."""
    import pandas as pd

    from egp_crn_spark.streaming import catalog_ingest_stream

    t = SnapshotLogTable(spark, str(tmp_path / "stream_corpus"),
                         partition_col="part")
    s0 = t.overwrite(_df(spark, _rows(range(30), "a")))
    C = train_centroids(t.read(s0), ncells=4, sample=32)
    idx, tombs = IM.build_index_state(t.read(s0), C, s0)

    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(
        "vec_id int, part string, embedding array<double>").parquet(str(src))
    q = catalog_ingest_stream(stream, t, lambda d: d,
                              str(tmp_path / "ck")).start()
    for b in range(2):
        ids = range(100 + 10 * b, 110 + 10 * b)
        pd.DataFrame({
            "vec_id": pd.array(list(ids), dtype="int32"),
            "part": [f"s{b}"] * 10,
            "embedding": [_vec(i) for i in ids],
        }).to_parquet(src / f"b{b}.parquet")
        q.processAllAvailable()
    q.stop()

    chain = sorted(s["snapshot_id"] for s in t.snapshots()
                   if s["snapshot_id"] >= s0)
    assert len(chain) == 3  # s0 + one commit per micro-batch
    for frm, to in zip(chain, chain[1:]):
        idx, tombs = IM.maintain_ivf_index(t, C, frm, to, idx, tombs)
    live = IM.live_index(idx, tombs)
    want, _ = IM.build_index_state(t.read(chain[-1]), C, chain[-1])
    assert _index_set(live, False) == _index_set(want, False)
    assert live.count() == 50


def test_index_persists_in_partitioned_snaplog_with_dirty_band_compaction(
        spark, tmp_path):
    """The full persistence loop the module docstring promises: the
    index lives in a snaplog table partitioned by cell band; maintenance
    APPENDS delta rows; compaction rewrites ONLY dirty bands via
    overwrite_partitions — clean bands' data files carry over
    unrewritten, and the compacted table equals a from-scratch rebuild."""
    t = SnapshotLogTable(spark, str(tmp_path / "corpus"),
                         partition_col="part")
    s1 = t.overwrite(_df(spark, _rows(range(60), "a")))
    C = train_centroids(t.read(s1), ncells=8, sample=64)

    def with_band(df):
        return df.withColumn("band", (F.col("cell") % 4).cast("string"))

    it = SnapshotLogTable(spark, str(tmp_path / "index"),
                          partition_col="band")
    idx, tombs = IM.build_index_state(t.read(s1), C, s1)
    it.overwrite(with_band(idx))

    # vintage 2: delete-and-update ids 0..9 (rewrite partition a)
    s2 = t.overwrite_partitions(_df(
        spark, _rows(range(10), "a", bump=2) + _rows(range(10, 60), "a")))
    appends, new_tombs = IM.index_delta(t.changelog(s1, s2), C, s2)
    it.append(with_band(appends))
    tombs = tombs.unionByName(new_tombs)

    # dirty bands = bands holding rows the live rule kills
    full = it.read().drop("band")
    live = IM.live_index(full, tombs)
    dead = full.exceptAll(live)
    dirty = {r.band for r in with_band(dead).select("band").distinct().collect()}
    assert 0 < len(dirty) <= 4

    before = {e["path"] for e in it.plan_files()}
    clean_before = {p for p in before
                    if not any(f"band={b}" in p for b in dirty)}
    it.overwrite_partitions(
        with_band(live).filter(F.col("band").isin(*dirty)))
    after = {e["path"] for e in it.plan_files()}
    # untouched bands carry their exact files; dirty bands rewrote
    assert clean_before <= after
    assert not any(p in after for p in before - clean_before)

    want, _ = IM.build_index_state(t.read(s2), C, s2)
    got = it.read().drop("band")
    assert _index_set(got, False) == _index_set(want, False)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_vintage_sequences_maintain_exactly(spark, tmp_path, seed):
    """Randomized model test (snaplog-style): a random sequence of
    appends / partition rewrites (with in-place vector updates, drops,
    and re-stated rows) maintained step-by-step equals the rebuild at
    EVERY snapshot."""
    import random

    rng = random.Random(seed)
    t = SnapshotLogTable(spark, str(tmp_path / f"rand{seed}"),
                         partition_col="part")
    parts = ["a", "b", "c"]
    model = {p: {i: 0 for i in range(20 * k, 20 * k + 20)}
             for k, p in enumerate(parts)}  # part -> {id: bump}
    next_id = 1000

    def rows_of(p):
        return [(i, p, _vec(i, bump)) for i, bump in model[p].items()]

    s = t.overwrite(_df(spark, [r for p in parts for r in rows_of(p)]))
    C = train_centroids(t.read(s), ncells=4, sample=64)
    idx, tombs = IM.build_index_state(t.read(s), C, s)

    for step in range(4):
        op = rng.choice(["append", "rewrite"])
        if op == "append":
            p = rng.choice(parts)
            new = {next_id + j: 0 for j in range(rng.randint(1, 8))}
            model[p].update(new)
            next_id += 10
            s2 = t.append(_df(spark, [(i, p, _vec(i)) for i in new]))
        else:
            p = rng.choice(parts)
            ids = list(model[p])
            for i in rng.sample(ids, k=min(5, len(ids))):
                model[p][i] += 1  # in-place vector update
            for i in rng.sample(list(model[p]), k=min(3, len(model[p]) - 1)):
                del model[p][i]  # dropped rows
            s2 = t.overwrite_partitions(_df(spark, rows_of(p)))
        idx, tombs = IM.maintain_ivf_index(t, C, s, s2, idx, tombs)
        s = s2
        live = IM.live_index(idx, tombs)
        want, _ = IM.build_index_state(t.read(s), C, s)
        assert _index_set(live, False) == _index_set(want, False), (seed, step, op)


def test_cell_balance_flags_drift(spark, trained):
    """A corpus that drifts into one region (all new vectors near a
    single centroid) must push max_over_mean well past the build-time
    ratio — the retrain/rebuild signal the docstring promises."""
    t, C, B, (s1, s2, s3) = trained
    idx, _ = IM.build_index_state(t.read(s1), C, s1)
    base = IM.cell_balance(idx)
    assert base["rows"] == 80 and base["cells"] <= 8
    # drifted corpus: 400 copies of (near) centroid 0's direction
    drift = spark.createDataFrame(
        [(5000 + i, "z", [float(x) + 0.01 * (i % 3) for x in C[0]])
         for i in range(400)],
        "vec_id int, part string, embedding array<double>")
    idx2, _ = IM.build_index_state(t.read(s1).unionByName(drift), C, s1)
    skewed = IM.cell_balance(idx2)
    assert skewed["rows"] == 480
    assert skewed["max_over_mean"] > 2 * base["max_over_mean"]


def test_tombstone_broadcast_guard_fallback(spark, trained):
    """VERDICT r7 #4: an oversized tombstone backlog flips live_index
    from broadcast to a shuffled join automatically — identical results
    both paths — and tombstone_backlog surfaces the compact-me signal."""
    t, C, B, (s1, s2, s3) = trained
    idx, tombs = IM.build_index_state(t.read(s1), C, s1)
    for frm, to in [(s1, s2), (s2, s3)]:
        idx, tombs = IM.maintain_ivf_index(t, C, frm, to, idx, tombs)
    # plant a backlog larger than a tiny broadcast cap
    auto_small = IM.live_index(idx, tombs, tombstone_broadcast_max=2)
    forced_bcast = IM.live_index(idx, tombs, broadcast_tombstones=True)
    forced_shuffle = IM.live_index(idx, tombs, broadcast_tombstones=False)
    want = _index_set(forced_bcast, False)
    assert _index_set(auto_small, False) == want
    assert _index_set(forced_shuffle, False) == want
    # the small-cap auto path must NOT contain a broadcast of tombstones
    from egp_crn_spark import plans
    p = plans.physical_plan(auto_small)
    assert "BroadcastHashJoin" not in p, p[:1200]
    p2 = plans.physical_plan(forced_bcast)
    assert "BroadcastHashJoin" in p2
    back = IM.tombstone_backlog(tombs, broadcast_max=2)
    assert back["ids"] > 2 and back["over_broadcast"]
    assert not IM.tombstone_backlog(tombs)["over_broadcast"]
    # compaction clears the pressure
    cidx, ctombs = IM.compact_index(idx, tombs)
    assert IM.tombstone_backlog(ctombs, broadcast_max=2)["ids"] == 0
