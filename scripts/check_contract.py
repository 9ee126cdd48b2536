"""Local simulation of the driver's correctness gate: run every
__spark_entry__ query at sf0.01 and compare against its DuckDB oracle
(row count + column names + order-insensitive values).

Usage:
    python scripts/check_contract.py                 # all queries
    python scripts/check_contract.py q1 q2 ...       # only the named ones
    python scripts/check_contract.py --stale-first N # the N least-recently
        driver-verified queries (reads the CORRECTNESS_r*.json files the
        driver writes, same staleness order as the queries() rotation) —
        one command reproduces the judge's "check what the driver window
        hasn't seen" sweep. A full no-arg run is the pre-snapshot gate.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and pd.isna(v)) else v)
        df[c] = df[c].map(lambda v: repr(round(v, 9)) if isinstance(v, float) else repr(v))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-contract")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    argv = sys.argv[1:]
    if argv[:1] == ["--stale-first"]:
        n = int(argv[1]) if len(argv) > 1 else 50
        # queries() is already rotated stalest-first after the pinned core;
        # skip the pinned 9 so --stale-first targets the actual backlog
        backlog = [k for k in qs if k not in entry_mod._PINNED_CORE]
        only = backlog[:n]
        print(f"stale-first {n}: {only}")
    else:
        only = argv
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {t1 - t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error {str(e)[:300]}")
            continue
        a, b = norm(sdf), norm(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            failures.append(name)
            diff = (a != b).any(axis=1)
            print(f"FAIL  {name}: value mismatch ({int(diff.sum())} rows)")
            print("  spark:", a[diff].head(3).to_dict("records"))
            print("  oracle:", b[diff].head(3).to_dict("records"))
            continue
        print(f"OK    {name}: {len(a)} rows match ({t1 - t0:.1f}s spark)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
