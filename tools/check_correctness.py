"""Local stand-in for the driver's correctness harness.

Runs every __spark_entry__.queries() entry at sf0.01 and compares against
its oracle_sql() twin via DuckDB: row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name,
values stringified with float rounding).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].map(lambda v: f"{v:.9g}" if pd.notna(v) else "NaN")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64").astype(str)
        else:
            df[c] = df[c].astype(str)
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    import __spark_entry__ as E
    from egp_crn_spark.session import get_session

    spark = get_session("correctness-check", cores=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows  [{t1-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failures += 1
            continue
        t2 = time.time()
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        else:
            mismatched = [
                (c, str(sdf[c].dtype), str(odf[c].dtype))
                for c in sdf.columns
                if str(sdf[c].dtype) != str(odf[c].dtype)
            ]
            if mismatched:
                problems.append(f"dtypes differ: {mismatched}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value hash {hs} != {ho}")
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)}  [spark {t1-t0:.1f}s oracle {t2-t1:.1f}s]")
        else:
            print(f"ok    {name}: {len(sdf)} rows match  [spark {t1-t0:.1f}s oracle {t2-t1:.1f}s]")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    raise SystemExit(main(only=only))
