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
