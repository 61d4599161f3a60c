"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ queries() entry against its oracle_sql() via DuckDB at
sf0.01 and compare row count + column names + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _rowset(cols: list[str], rows) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    return tuple(normed)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    # grade the driver-facing 50 PLUS the beyond-window extras — local
    # coverage is a superset of what the driver sees
    qs = {**entry_mod.queries(), **entry_mod.extra_queries()}
    oracles = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            status = "ROWS-ONLY"
            ok = len(rows) >= 0
            n_rows_only += 1
            print(f"{status:9s} {name}: {len(rows)} rows  {dt:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [c[0] for c in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"columns {sorted(cols)} != {sorted(ocols)}")
        if not problems:
            a = _rowset(cols, rows)
            b = _rowset(ocols, orows)
            if a != b:
                diffs = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS      {name}: {len(rows)} rows  {dt:.1f}s")
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"({len(qs)} queries total)"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
