#!/usr/bin/env python3
"""Generate an sf1-scale dataset (10x sf0.1) for the scale sweep.

Dev-side tool (like tools/check.py): replicates every sf0.1 fact table
10x with FK-consistent key shifts, so joins land on the matching
replica, key cardinalities grow 10x, and per-key distributions keep
their sf0.1 shape (the realistic scale-up: more customers/orders/docs,
not deeper rows per key). Dimension tables (region, nation) stay fixed,
as in TPC-H. Document texts get a per-replica suffix so the corpus does
not collapse into 10-way exact duplicates (near-dup structure within a
replica is preserved).

Usage: python3 tools/gen_sf1.py [outdir] [replicas] [table,table,...]
       (defaults: /root/repo/target/sf1, 10, all tables)
e.g. an sf10 probe set of just the text/event facts:
       python3 tools/gen_sf1.py target/sf10 100 documents,events
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"

REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
# shifts chosen above each key's max at sf0.1
S_CUST, S_SUPP, S_PART, S_ORD = 20_000, 2_000, 30_000, 200_000
S_EVT, S_USER, S_DOC, S_VEC = 200_000, 2_000, 10_000, 10_000

TABLES = {
    "region": None,   # fixed dimension
    "nation": None,   # fixed dimension
    "customer": f"""
        SELECT c_custkey + r * {S_CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM t, range({REPLICAS}) s(r)""",
    "supplier": f"""
        SELECT s_suppkey + r * {S_SUPP} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM t, range({REPLICAS}) s(r)""",
    "part": f"""
        SELECT p_partkey + r * {S_PART} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM t, range({REPLICAS}) s(r)""",
    "orders": f"""
        SELECT o_orderkey + r * {S_ORD} AS o_orderkey,
               o_custkey + r * {S_CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM t, range({REPLICAS}) s(r)""",
    "lineitem": f"""
        SELECT l_orderkey + r * {S_ORD} AS l_orderkey,
               l_partkey + r * {S_PART} AS l_partkey,
               l_suppkey + r * {S_SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM t, range({REPLICAS}) s(r)""",
    "events": f"""
        SELECT event_id + r * {S_EVT} AS event_id, ts,
               user_id + r * {S_USER} AS user_id,
               event_type, value, props
        FROM t, range({REPLICAS}) s(r)""",
    "documents": f"""
        SELECT doc_id + r * {S_DOC} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE text || ' replica' || r END AS text,
               lang, source,
               CAST(length(CASE WHEN r = 0 THEN text
                    ELSE text || ' replica' || r END) AS BIGINT) AS n_chars
        FROM t, range({REPLICAS}) s(r)""",
    "embeddings": f"""
        SELECT vec_id + r * {S_VEC} AS vec_id, embedding, label
        FROM t, range({REPLICAS}) s(r)""",
}


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for name, sql in TABLES.items():
        if ONLY is not None and name not in ONLY:
            continue
        src = f"{SRC}/{name}.parquet"
        dst = f"{OUT}/{name}.parquet"
        if sql is None:
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            q = sql.replace("FROM t", f"FROM '{src}' t")
            con.execute(f"COPY ({q} ORDER BY 1) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{name}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()
