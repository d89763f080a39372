#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run each oracle SQL in DuckDB over the testdata parquet tables and compare
against the Spark parquet outputs produced by `graft.Verify`.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(Not part of the shipped library — the library is pure Scala/Spark.)
"""
import sys, json, glob, math, os
import duckdb
import pyarrow.parquet as pq

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format stably
        if v == 0:
            return "0"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_rows(cols_names, cols_values):
    # sort columns by name (driver behavior), then sort rows
    order = sorted(range(len(cols_names)), key=lambda i: cols_names[i])
    names = [cols_names[i] for i in order]
    rows = list(zip(*[cols_values[i] for i in order])) if cols_values else []
    rows = sorted(tuple(norm(v) for v in r) for r in rows)
    return names, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_t = pq.read_table(files[0])
        s_names, s_rows = table_rows(
            spark_t.column_names, [c.to_pylist() for c in spark_t.columns])
        try:
            duck_t = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        d_names, d_rows = table_rows(
            duck_t.column_names, [c.to_pylist() for c in duck_t.columns])
        if s_names != d_names:
            print(f"FAIL {name}: columns spark={s_names} duck={d_names}"); n_fail += 1; continue
        if s_rows != d_rows:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            diffs = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
            for i in diffs[:3]:
                print(f"   row {i}: spark={s_rows[i]}")
                print(f"   row {i}:  duck={d_rows[i]}")
            if len(s_rows) != len(d_rows):
                only_s = set(s_rows) - set(d_rows)
                only_d = set(d_rows) - set(s_rows)
                for r in list(only_s)[:2]: print(f"   only-spark: {r}")
                for r in list(only_d)[:2]: print(f"   only-duck:  {r}")
            continue
        n_pass += 1
        print(f"PASS {name} ({len(s_rows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
