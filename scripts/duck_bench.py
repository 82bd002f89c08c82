#!/usr/bin/env python3
"""DuckDB-side timings of the oracle SQL corpus — the BENCH baseline.

Usage: python3 scripts/duck_bench.py <sfDir> <oracle_sql.json> [repeat]
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, repeat=2):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # BenchStage multi-file layout
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in sorted(oracle):
        best = None
        for _ in range(repeat):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
        print(f"{best:8.3f}  {name}", flush=True)
    print(json.dumps({"sf": sf_dir, "queries": out}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
