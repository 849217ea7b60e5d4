#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet fixtures and compare (column-name-sorted,
row-sorted) against the parquet dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    # Normalize for comparison: treat NaN, timestamps, Decimal uniformly.
    import math, datetime, decimal
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", repr(v))  # exact repr: catches any fp drift
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return ("t", v.isoformat())
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v

def table_to_rows(tbl):
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    rows = [tuple(norm_cell(data[c][i]) for c in cols) for i in range(n)]
    return cols, sorted(rows, key=repr)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            got = pq.read_table(files[0])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        gc, gr = table_to_rows(got)
        ec, er = table_to_rows(exp)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: row count spark={len(gr)} duck={len(er)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first @{i}:")
            print(f"  cols : {gc}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
