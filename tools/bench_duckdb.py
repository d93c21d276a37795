#!/usr/bin/env python3
"""Time the oracle SQL in DuckDB at a given sf for a single-node
throughput comparison against graft.Bench output.

Usage: python3 tools/bench_duckdb.py <verify_out_dir_with_oracle_sql.json> <sf_dir>
"""
import json, os, sys, time
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    total = 0.0
    results = {}
    for name, sql in sorted(oracle.items()):
        con.execute(sql).fetchall()  # warmup
        runs = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(time.time() - t0)
        med = sorted(runs)[1]
        results[name] = med
        total += med
        print(f"{name:24s}{med:8.3f}s")
    print(f"TOTAL {total:.2f}s over {len(results)} queries")
    json.dump({"total": total, "queries": results},
              open(os.path.join(out_dir, "duckdb_times.json"), "w"))

if __name__ == "__main__":
    main()
