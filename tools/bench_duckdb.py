#!/usr/bin/env python3
"""DuckDB side-by-side throughput reference (dev tooling only, not part
of the shipped library).

Runs every oracle SQL from a graft.Verify dump against the same parquet
tables in DuckDB, timed per query (median of N reps after one warmup),
and prints one JSON line in the same shape as graft.Bench — a
single-node native-engine reference point for BENCH comparisons.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [reps]
"""
import json, sys, time, statistics
import duckdb

def main(sf_dir, out_dir, reps=3):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results, errors = {}, {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            con.execute(sql).fetchall()  # warmup
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                times.append(time.perf_counter() - t0)
            results[name] = statistics.median(times)
        except Exception as e:
            results[name] = -1.0
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
    total = sum(v for v in results.values() if v >= 0)
    print(json.dumps({"metric": "total", "value": total, "unit": "sec",
                      "engine": "duckdb", "reps": reps, "queries": results,
                      "errors": errors, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
