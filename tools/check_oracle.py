#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the raw sf tables, and
compares: row count, column names (sorted), and values (sorted rows,
doubles rounded to 6 significant-ish digits).
"""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    def c(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        return str(v)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(c(r[i]) for i in idx) for r in rows)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(grows)} rows "
                  + ("(non-empty ok)" if grows else "(EMPTY!)"))
            continue
        try:
            exp = con.sql(oracle[name])
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}"); n_fail += 1; continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}"); n_fail += 1; continue
        cg, ce = canon(grows, gcols), canon(erows, ecols)
        if cg != ce:
            bad = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"   got {cg[i]}\n   exp {ce[i]}")
            n_fail += 1; continue
        print(f"PASS {name}: {len(grows)} rows")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
