"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship conflation query (the reference's core
semantic — /root/reference/src/conflation/conflate_meshblock.py:92-155)
on sf0.001. ``queries()``/``oracle_sql()`` expose one entry per
implemented operator family from SURVEY.md §2, backed by
egp_crn_spark.driverq (Spark callable + DuckDB oracle twins).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from egp_crn_spark.driverq import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    try:  # workers need the package on their path (spark-submit --py-files)
        from egp_crn_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added or session forbids it — queries still run
    fn, _ = QUERIES["conflation_crn"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible ops — driver then records rows-only)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
