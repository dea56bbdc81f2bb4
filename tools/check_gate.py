"""Local mirror of the driver's correctness gate: run every queries()
entry against its oracle_sql() in DuckDB on the same parquet tables and
compare row count + column names + order-insensitive values.

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from estuary_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def row_key(row, cols):
    return tuple(norm_val(row[c]) for c in cols)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("gate-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(spdf)} rows, cols={sorted(spdf.columns)}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"[FAIL] {name}: oracle error {str(e)[:200]}")
            continue

        sc, oc = sorted(spdf.columns), sorted(odf.columns)
        if sc != oc:
            failures.append((name, f"columns {sc} != {oc}"))
            print(f"[FAIL] {name}: columns {sc} != {oc}")
            continue
        if len(spdf) != len(odf):
            failures.append((name, f"rows {len(spdf)} != {len(odf)}"))
            print(f"[FAIL] {name}: rows {len(spdf)} != {len(odf)}")
            continue
        a = sorted(row_key(r, sc) for _, r in spdf.iterrows())
        b = sorted(row_key(r, sc) for _, r in odf.iterrows())
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diffs}"))
            print(f"[FAIL] {name}: values differ e.g. {diffs}")
            continue
        print(f"[ OK ] {name}: {len(spdf)} rows match")

    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
