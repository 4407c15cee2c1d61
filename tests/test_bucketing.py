"""Bucketed co-located joins: two tables bucketed on the same key join
with ZERO shuffle exchanges — the engine's primitive for repeatedly
joined fact tables (images ⋈ tile outputs on cell_id)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from egp_crn_spark import plans
from egp_crn_spark.functions import cells as C
from egp_crn_spark.functions.georef import key_x, key_y
from egp_crn_spark.sources.tables import save_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark):
    pts = spark.range(20_000).select(
        F.col("id").alias("k"),
        C.cell_of_xy(key_x(F.col("id")), key_y(F.col("id")), 6).alias("cell_id"),
        (F.col("id") % 100).alias("v"),
    )
    other = spark.range(5_000).select(
        F.col("id").alias("k2"),
        C.cell_of_xy(key_x(F.col("id") * 3 + 1), key_y(F.col("id") * 3 + 1), 6).alias("cell_id"),
        (F.col("id") % 7).alias("w"),
    )
    save_bucketed_table(pts, "bt_points", "cell_id", num_buckets=8)
    save_bucketed_table(other, "bt_other", "cell_id", num_buckets=8)
    yield spark.table("bt_points"), spark.table("bt_other")
    spark.sql("drop table if exists bt_points")
    spark.sql("drop table if exists bt_other")


def test_bucketed_join_no_shuffle(spark, bucketed):
    a, b = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = a.join(b, "cell_id").groupBy("cell_id").count()
        assert plans.count_exchanges(a.join(b, "cell_id")) == 0, \
            plans.physical_plan(a.join(b, "cell_id"))
        # correctness unchanged vs a plain (shuffling) join
        plain_a = a.repartition(4)
        want = plain_a.join(b, "cell_id").count()
        assert a.join(b, "cell_id").count() == want
        del joined
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregate_no_shuffle(spark, bucketed):
    a, _ = bucketed
    agg = a.groupBy("cell_id").agg(F.sum("v"))
    assert plans.count_exchanges(agg) == 0, plans.physical_plan(agg)


def test_ivf_index_bucketed_serving(spark):
    """The ANN serving path: ivf_assign builds the index, it is WRITTEN
    bucketed by cell, and ivf_probe against the bucketed table shuffles
    ONLY the (small) probe side — the corpus side reads pre-bucketed
    with no Exchange above its scan."""
    import numpy as np
    from pyspark.sql import functions as F

    from egp_crn_spark import plans
    from egp_crn_spark.operators.similarity import ivf_assign, ivf_probe

    rng = np.random.default_rng(5)
    C = rng.standard_normal((4, 8))
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    corpus = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.xxhash64("id", F.lit(d)), F.lit(1001)).cast("double") / 500.0 - 1.0)
            for d in range(8)
        ]).alias("embedding"),
    )
    spark.sql("drop table if exists bt_ivf_index")
    save_bucketed_table(ivf_assign(corpus, C), "bt_ivf_index", "cell", num_buckets=4)
    index = spark.table("bt_ivf_index")
    queries = corpus.filter("vec_id % 40 = 0").select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
    out = ivf_probe(queries, index, C, k=3, nprobe=2)
    p = plans.physical_plan(out)
    # the corpus/index side must come straight off the bucketed scan:
    # exactly the exchanges needed for the probe side + window remain
    import re
    scan_bucketed = re.search(r"Scan parquet [^\n]*bt_ivf_index[^\n]*Bucketed: true",
                              p) or "SelectedBucketsCount" in p
    assert scan_bucketed, f"index scan must be bucketed:\n{p[:1500]}"
    assert out.count() > 0
    spark.sql("drop table if exists bt_ivf_index")
