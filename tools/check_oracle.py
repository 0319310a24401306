"""Driver-mimicking correctness harness: run every queries() entry in Spark
and its oracle_sql() in DuckDB on the same sf dir; compare row count, schema
arity, and order-insensitive values.

Usage: PYTHONPATH=. python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(rows):
    return sorted(tuple(norm_cell(c) for c in r) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tiflow_spark.oracles import ORACLES
    from tiflow_spark.queries import QUERIES
    from tiflow_spark.session import get_spark

    spark = get_spark(app="check_oracle", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in ORACLES:
            print(f"SKIP {name}: no oracle (rows-only: {len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(ORACLES[name])
            drows = res.fetchall()
            dcols = res.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok_cols = [c.lower() for c in scols] == [c.lower() for c in dcols]
        ok_count = len(srows) == len(drows)
        sn, dn = norm_rows(srows), norm_rows(drows)
        ok_vals = sn == dn
        status = "OK  " if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)}"
            f" cols={'ok' if ok_cols else f'{scols} vs {dcols}'}"
            f" vals={'ok' if ok_vals else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if not ok_vals and ok_count:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            for a, b in diff:
                print(f"    spark : {a}\n    duckdb: {b}")
        elif not ok_count:
            only_s = [r for r in sn if r not in set(dn)][:2]
            only_d = [r for r in dn if r not in set(sn)][:2]
            print(f"    only-spark: {only_s}\n    only-duck : {only_d}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
