#!/usr/bin/env python3
"""Write one-time oracle FIXTURE tables next to a generated dataset.

The td11/td15/td95 oracles recompute 128 hyperplane signatures per row
through DuckDB list lambdas (~20 min per query at sf1). The signatures
are row-local and engine-independent, so we compute them ONCE per
dataset — with DuckDB itself, from the raw tables, via the relational
plan shape in SparkEntry.oracleFixtureSql — and the checker's override
oracles read the fixture instead. The driver's sf0.01 gate never sees
fixtures (none are generated under /root/testdata) and keeps running the
self-contained originals.

Usage: python3 tools/gen_fixtures.py <sfDir> <verifyOutDir>
  <verifyOutDir> must hold oracle_fixtures.json (written by graft.Verify).
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    fx = json.load(open(f"{out_dir}/oracle_fixtures.json"))["fixtures"]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, sql in sorted(fx.items()):
        dest = f"{sf_dir}/{name}.parquet"
        t0 = time.time()
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        print(f"WROTE {dest} in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
