#!/usr/bin/env python
"""Simulate the grading driver: run __spark_entry__ queries() vs
oracle_sql() on DuckDB at sf0.01 and report, per entry:

  rows / schema(column names) / VALUES (6dp) / CELL PYTHON TYPES

The cell-type check is stricter than value equality — round 1 showed the
driver's value-hash distinguishes Decimal from float and HUGEINT from
int even when values match, so both sides must yield the same Python
type per column after fetch (Spark Row -> python, duckdb fetchall).

Usage: python scripts/driver_check.py [entry ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    # Every value canonicalizes to a TUPLE whose first element is a str:
    # a bare None/str next to ("f", x) in the same column position makes
    # sorted() compare str against tuple and crash the whole run instead
    # of printing FAIL for the one entry (nullable numeric columns).
    if isinstance(v, bool):
        return ("b", v)
    if v is None:
        return ("none",)
    if isinstance(v, Decimal):
        return ("dec", round(float(v), 6))
    if isinstance(v, float):
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def typ(v):
    return type(v).__name__


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as M

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, osql = M.queries(), M.oracle_sql()
    names = sys.argv[1:] or list(qs)
    n_bad = 0
    for name in names:
        fn = qs[name]
        sdf = fn(spark, SF)
        scols = sdf.columns
        srows = sdf.collect()
        if name not in osql:
            # The real driver's rows-only check still requires rows: an
            # empty result from a rows-only entry is a regression this
            # simulator must fail on, not print past.
            if not srows:
                n_bad += 1
                print(f"{name}: FAIL (NO_ORACLE, 0 rows)")
            else:
                print(f"{name}: NO_ORACLE rows={len(srows)}")
            continue
        cur = con.execute(osql[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        order = lambda cols: sorted(range(len(cols)), key=lambda i: cols[i])
        si, oi = order(scols), order(ocols)
        sset = sorted(tuple(canon(r[i]) for i in si) for r in srows)
        oset = sorted(tuple(canon(r[i]) for i in oi) for r in orows)
        stypes = [
            {typ(r[i]) for r in srows if r[i] is not None} for i in si
        ]
        otypes = [
            {typ(r[i]) for r in orows if r[i] is not None} for i in oi
        ]
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_vals = sset == oset
        ok_types = stypes == otypes
        status = "OK" if (ok_rows and ok_schema and ok_vals and ok_types) else "FAIL"
        if status == "FAIL":
            n_bad += 1
        print(
            f"{name}: {status} rows={len(srows)}/{len(orows)} "
            f"schema={ok_schema} vals={ok_vals} types={ok_types}"
        )
        if not ok_schema:
            print(f"    spark cols: {sorted(scols)}\n    duck  cols: {sorted(ocols)}")
        if not ok_types:
            for c, (a, b) in zip(sorted(scols), zip(stypes, otypes)):
                if a != b:
                    print(f"    col {c}: spark={a} duck={b}")
        if not ok_vals:
            diff = [
                (a, b) for a, b in zip(sset, oset) if a != b
            ][:3]
            for a, b in diff:
                print(f"    spark={a}\n    duck ={b}")
    print(f"checked {len(names)}, failures {n_bad}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
