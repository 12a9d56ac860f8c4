"""Local replica of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, compare row count + (sorted-column)
schema + order-insensitive value multiset.

Usage: PYTHONPATH=/root/repo python scripts/oracle_check.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from tiny_md_hbase_spark.session import get_spark
from tiny_md_hbase_spark.sources.tables import TABLE_NAMES


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(round(v, 9))
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _multiset(rows, col_order):
    return Counter(tuple(_norm(row[i]) for i in col_order) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for key, fn in qs.items():
        if only and key not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        col_order = [sdf.columns.index(c) for c in scols]
        srows = sdf.collect()

        if key not in oracles:
            print(f"{key:24s} rows={len(srows):8d}  (rows-only: no oracle)")
            continue

        cur = con.execute(oracles[key])
        ocols_raw = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ocols = sorted(ocols_raw)
        ocol_order = [ocols_raw.index(c) for c in ocols]

        ok_cols = scols == ocols
        ok_count = len(srows) == len(orows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = _multiset(srows, col_order) == _multiset(orows, ocol_order)
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{key:24s} rows={len(srows):8d} oracle={len(orows):8d} "
            f"cols={'=' if ok_cols else f'{scols}!={ocols}'} vals={'=' if ok_vals else 'DIFF'} {status}"
        )
        if status == "FAIL":
            failures.append(key)
            if ok_cols and ok_count:
                sm = _multiset(srows, col_order)
                om = _multiset(orows, ocol_order)
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                print(f"    spark-only: {diff_s}\n    oracle-only: {diff_o}")
    _print_ledger(qs, oracles)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL OK")
    return 0


def _print_ledger(qs: dict, oracles: dict) -> None:
    """Registry ledger + diff against the COVERAGE.md header — the header's
    counts are load-bearing for the rotation bookkeeping, so they are
    machine-checked here instead of trusted."""
    import re

    total, with_oracle = len(qs), sum(1 for k in qs if k in oracles)
    rows_only = sorted(k for k in qs if k not in oracles)
    dangling = sorted(k for k in oracles if k not in qs)
    print(
        f"LEDGER: {total} keys, {with_oracle} with oracles; "
        f"rows-only ({len(rows_only)}): {', '.join(rows_only)}"
    )
    if dangling:
        print(f"LEDGER WARNING: oracle_sql without queries() entry: {dangling}")
    cov = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    if os.path.exists(cov):
        with open(cov) as f:
            head = f.read(600)
        m = re.search(r"\((\d+) total, (\d+) with", head)
        if not m:
            print("LEDGER WARNING: COVERAGE.md header counts not found")
        elif (int(m.group(1)), int(m.group(2))) != (total, with_oracle):
            print(
                f"LEDGER MISMATCH: COVERAGE.md says {m.group(1)}/{m.group(2)}, "
                f"registry is {total}/{with_oracle}"
            )
        else:
            print("LEDGER: COVERAGE.md header counts match")


if __name__ == "__main__":
    sys.exit(main())
