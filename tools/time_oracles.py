#!/usr/bin/env python3
"""Regenerate the DuckDB anchor: time every oracle SQL at a given sf dir.

Usage: python3 tools/time_oracles.py <sfDir> <oracle_sql.json> [out.json]

Times each oracle query best-of-2 (matching BASELINE.md's protocol) over
views on <sfDir>/*.parquet and writes {query: seconds} JSON (default
/tmp/duckdb_sf01_times.json). Merges into an existing out file so a
partial rerun (new queries only: pass a filtered oracle_sql.json) keeps
earlier rows.
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, sql_json, out_path="/tmp/duckdb_sf01_times.json"):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(sql_json))
    out = {}
    if os.path.exists(out_path):
        out = json.load(open(out_path))
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"ERR      {name}: {e}")
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            out[name] = best
            print(f"{best:8.3f} {name}")
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"total {sum(out.values()):.1f}s over {len(out)} queries -> {out_path}")

if __name__ == "__main__":
    main(*sys.argv[1:])
