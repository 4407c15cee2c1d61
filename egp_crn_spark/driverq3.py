"""Driver-contract queries, batch 3: neighbourhood review + source conformance."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.neighbours import compare_neighbours


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .driverq import ensure_shipped

    ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- neighbours
_NB_N, _NB_CELL = 4, 65536.0 / 4


def _grid_blocks(keys: DataFrame, key_col: str) -> DataFrame:
    i = F.col(key_col) % _NB_N
    j = F.expr(f"{key_col} div {_NB_N}")
    c = _NB_CELL
    return keys.select(
        F.col(key_col).alias("bb_uid"),
        F.array(
            F.array(i * c, j * c),
            F.array((i + 1) * c, j * c),
            F.array((i + 1) * c, (j + 1) * c),
            F.array(i * c, (j + 1) * c),
        ).alias("vertices"),
    )


def q_neighbour_review(spark, sf_dir):
    """review_meshblock semantics: CRN = full 4x4 block grid, NGD = same
    grid with keys%7==3 dropped; diff per-block neighbour sets."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < _NB_N * _NB_N)
    crn = _grid_blocks(part, "p_partkey")
    ngd = _grid_blocks(part.filter(F.col("p_partkey") % 7 != 3), "p_partkey")
    return compare_neighbours(crn, ngd)


SQL_NEIGHBOUR_REVIEW = f"""
  with crn as (select p_partkey as k, p_partkey % {_NB_N} as i,
                      p_partkey // {_NB_N} as j
               from part where p_partkey < {_NB_N * _NB_N}),
  ngd as (select * from crn where k % 7 != 3),
  crn_n as (select a.k as block, list(b.k order by b.k) as nbrs
            from crn a join crn b
              on b.k != a.k and abs(a.i - b.i) <= 1 and abs(a.j - b.j) <= 1
            group by a.k),
  ngd_n as (select a.k as block, list(b.k order by b.k) as nbrs
            from ngd a join ngd b
              on b.k != a.k and abs(a.i - b.i) <= 1 and abs(a.j - b.j) <= 1
            group by a.k),
  j as (select c.block,
               coalesce(c.nbrs, []::bigint[]) as cn,
               coalesce(n.nbrs, []::bigint[]) as nn
        from crn_n c left join ngd_n n using (block))
  select block,
         case when len(list_filter(cn, x -> not list_contains(nn, x))) > 0
              then array_to_string(list_sort(list_filter(cn, x -> not list_contains(nn, x))), ',')
              end as extra,
         case when len(list_filter(nn, x -> not list_contains(cn, x))) > 0
              then array_to_string(list_sort(list_filter(nn, x -> not list_contains(cn, x))), ',')
              end as missing,
         len(list_filter(cn, x -> not list_contains(nn, x))) = 0
           and len(list_filter(nn, x -> not list_contains(cn, x))) = 0 as identical
  from j
"""


# ---------------------------------------------------------------- conformance
def q_conform_source(spark, sf_dir):
    """conform_deltas_src semantics (S6/P2/P3/P8): pushdown filter +
    semi-join extract + rename + domain-coded classification — all
    Catalyst-native (the reference shells out to ogr2ogr SQL)."""
    orders = _t(spark, sf_dir, "orders")
    customers = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    status_domain = F.when(F.col("o_orderstatus") == "F", "Finished") \
        .when(F.col("o_orderstatus") == "O", "Open").otherwise("Pending")
    return (
        orders.filter(F.col("o_totalprice") > 100.0)
        .join(customers.select("c_custkey"), orders.o_custkey == F.col("c_custkey"),
              "left_semi")
        .select(
            F.col("o_orderkey").alias("uid"),
            status_domain.alias("status"),
            F.substring(F.col("o_orderpriority"), 1, 1).alias("priority_code"),
        )
    )


SQL_CONFORM_SOURCE = """
  select o_orderkey as uid,
         case when o_orderstatus = 'F' then 'Finished'
              when o_orderstatus = 'O' then 'Open'
              else 'Pending' end as status,
         substr(o_orderpriority, 1, 1) as priority_code
  from orders
  where o_totalprice > 100.0
    and o_custkey in (select c_custkey from customer where c_mktsegment = 'BUILDING')
"""


QUERIES3 = {
    "neighbour_review": (q_neighbour_review, SQL_NEIGHBOUR_REVIEW),
    "conform_source": (q_conform_source, SQL_CONFORM_SOURCE),
}
