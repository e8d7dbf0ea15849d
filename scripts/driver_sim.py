"""Simulate the driver's verify: run entry() as smoke, then every
queries()[name] vs oracle_sql()[name] on DuckDB at sf0.01, comparing
row count + column names + order-insensitive value hash.

Usage: python scripts/driver_sim.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def array_cells(rows) -> bool:
    """The REAL driver canonicalizes with pandas sort_values over all
    columns, which raises 'unhashable type: list' on any array-valued
    cell (CORRECTNESS_r05: embedding_quantize/embedding_project ERR).
    Mirror that: any list/tuple/ndarray cell in an oracle-gated result
    is a hard FAIL here, even though norm_cell could serialize it.
    ALL rows are scanned — an array column that is NULL in the first
    rows of the sort order (e.g. an empty collect_list) would
    false-pass a prefix check but still ERR the real driver."""
    import numpy as np

    for r in rows:
        for v in r:
            if isinstance(v, (list, tuple, dict, np.ndarray)):
                return True
    return False


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    only = set(sys.argv[1:])
    import __spark_entry__ as e
    from balboa_spark.session import get_spark

    spark = get_spark("driver-sim")

    t0 = time.time()
    smoke = e.entry(spark)
    n = smoke.count()
    print(f"[smoke] entry() -> {n} rows, schema: {smoke.columns} ({time.time()-t0:.1f}s)")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = e.queries(), e.oracle_sql()
    # The REAL driver grades only the first 50 registry entries in
    # insertion order (CORRECTNESS_r05 silently dropped slots 50-59).
    # Surface the cut so a new registration never hides one unnoticed.
    names = list(qs)
    if len(names) > 50:
        print(
            f"[cap] {len(names)} queries registered; driver grades the "
            f"first 50 — UNGRADED tail: {names[50:]}"
        )
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            s_cols = df.columns
            s_rows = [[r[c] for c in s_cols] for r in df.collect()]
        except Exception as ex:
            print(f"[FAIL] {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        if array_cells(s_rows):
            print(f"[FAIL] {name}: array-valued cells (driver canon would ERR)")
            failed.append(name)
            continue
        try:
            rel = con.sql(os_[name])
            d_cols, d_rows = rel.columns, rel.fetchall()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle error: {ex}")
            failed.append(name)
            continue
        from balboa_spark.arrowcmp import type_mismatches

        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_n = len(s_rows) == len(d_rows)
        tm = type_mismatches(df, con.sql(os_[name])) if ok_cols else ["cols differ"]
        ok_types = not tm
        ok_vals = canon(s_cols, s_rows) == canon(d_cols, d_rows) if ok_cols and ok_n else False
        status = "OK" if (ok_cols and ok_n and ok_vals and ok_types) else "FAIL"
        print(
            f"[{status}] {name}: rows={len(s_rows)}/{len(d_rows)} cols={ok_cols} "
            f"types={ok_types} vals={ok_vals} ({time.time()-t0:.1f}s)"
        )
        if tm and ok_cols:
            for m in tm:
                print(f"    type: {m}")
        if status == "FAIL":
            failed.append(name)
            if ok_cols and ok_n:
                a, b = canon(s_cols, s_rows), canon(d_cols, d_rows)
                for x, y in zip(a, b):
                    if x != y:
                        print(f"    spark:  {x[:200]}\n    oracle: {y[:200]}")
                        break
            else:
                print(f"    spark cols: {sorted(s_cols)}\n    duck  cols: {sorted(d_cols)}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
