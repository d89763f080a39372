#!/usr/bin/env python3
"""Arrow-schema sweep: for every registry oracle, run the SQL in DuckDB via
fetch_arrow_table() and diff the per-column Arrow types against the Spark
parquet written by `graft.Verify`. The driver's hasher tolerates SOME type
divergences today (timestamp us/ns, int32/64) but not others (decimal128 —
the round-4/5 d14 red streak); goal state is ZERO divergences so a driver
normalization change can't flip green rows red.

Usage: python3 tools/schema_sweep.py <sfDir> <verifyOutDir>
(Dev-only harness — not part of the shipped library.)
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_div = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no spark output")
            continue
        spark_schema = {f.name: f.type for f in pq.read_schema(files[0])}
        try:
            duck_t = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"ERR  {name}: duckdb error: {e}")
            n_div += 1
            continue
        duck_schema = {f.name: f.type for f in duck_t.schema}
        if set(spark_schema) != set(duck_schema):
            print(f"DIVERGE {name}: columns spark={sorted(spark_schema)} "
                  f"duck={sorted(duck_schema)}")
            n_div += 1
            continue
        diffs = [(c, str(spark_schema[c]), str(duck_schema[c]))
                 for c in sorted(spark_schema)
                 if spark_schema[c] != duck_schema[c]]
        if diffs:
            n_div += 1
            for c, s, d in diffs:
                print(f"DIVERGE {name}.{c}: spark={s} duck={d}")
    print(f"\n{n_div} queries with schema divergence "
          f"out of {len(oracle)}")
    return 1 if n_div else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
