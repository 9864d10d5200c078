"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir; compare row count, column names, and an order-insensitive
value multiset (NaN/None normalized, floats via repr).

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from enhydris_autoprocess_spark.session import build_session

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(canon_cell(r[i]) for i in idx) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]", app_name="check-entry",
        extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:<20} rows-only: {len(srows)} rows")
            continue
        ddf = con.sql(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"{name:<20} COLS MISMATCH spark={scols} duck={dcols}")
            ok = False
        elif len(srows) != len(drows):
            print(f"{name:<20} COUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            a = canon_rows(scols, [[r[c] for c in scols] for r in srows])
            b = canon_rows(dcols, drows)
            if a != b:
                sa, sb = set(a), set(b)
                diff_a = [x for x in a if x not in sb][:3]
                diff_b = [x for x in b if x not in sa][:3]
                print(f"{name:<20} VALUE MISMATCH ({len(srows)} rows)")
                print("  spark-only:", diff_a)
                print("  duck-only :", diff_b)
                ok = False
        if ok:
            print(f"{name:<20} OK ({len(srows)} rows)")
        else:
            failures += 1
    # entry smoke
    if not only:
        n = entrymod.entry(spark).count()
        print(f"entry() smoke: {n} rows")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
