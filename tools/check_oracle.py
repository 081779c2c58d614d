"""Self-check harness mimicking the driver's correctness gate:

runs every ``queries()`` entry on Spark and (when present) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row-count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from json_ld_spark.session import get_spark


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, decimal.Decimal):
                v = float(v)
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def normalize_strict(rows, cols):
    """Type-tagged exact values — catches representation drifts the 6-dp
    normalization hides (e.g. DuckDB HUGEINT sums fetched as Decimal vs
    Spark BIGINT fetched as int), which is what the driver's value-hash
    actually compares (CORRECTNESS r01: dedup_simhash / rel_sessionize)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                vals.append("float:nan")
            else:
                vals.append(f"{type(v).__name__}:{v!r}")
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        s_norm = normalize(srows, scols)
        d_norm = normalize(drows, dcols)
        ok_vals = s_norm == d_norm
        ok_exact = normalize_strict(srows, scols) == normalize_strict(drows, dcols)
        status = "OK" if (ok_cols and ok_vals and ok_exact) else "FAIL"
        print(
            f"{name:24s} {status}  spark={len(srows)} duck={len(drows)} "
            f"cols_match={ok_cols} exact={ok_exact}"
        )
        if not ok_cols:
            print(f"    spark cols: {sorted(scols)}")
            print(f"    duck  cols: {sorted(dcols)}")
        if not ok_vals:
            miss = [r for r in d_norm if r not in set(s_norm)][:3]
            extra = [r for r in s_norm if r not in set(d_norm)][:3]
            print(f"    only-in-duck (3): {miss}")
            print(f"    only-in-spark (3): {extra}")
        elif not ok_exact:
            ss = normalize_strict(srows, scols)
            dd = normalize_strict(drows, dcols)
            drift = [
                (a, b) for a, b in zip(ss, dd) if a != b
            ][:3]
            print(f"    exact-drift (3): {drift}")
        if not (ok_cols and ok_vals and ok_exact):
            failures.append(name)
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
