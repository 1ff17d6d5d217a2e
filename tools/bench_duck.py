#!/usr/bin/env python3
"""DuckDB-side timing twin of graft.Bench, for the floor-amortization
comparison (BASELINE.md): runs the named oracle queries against the same
parquet directory the Spark bench used (plain sf dir or an amplified
staging dir written by SPARK_GRAFT_AMPLIFY), 1 warm-up + 3 timed runs,
prints one JSON line with per-query median and min seconds.

Usage:
  python3 tools/bench_duck.py <dataDir> <oracle_sql.json> <name> [name...]

<dataDir> tables may be single parquet files (driver layout) or
directories of part files (Spark staging layout).
"""
import sys, json, time, os, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    datadir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in TABLES:
        p = f"{datadir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        if glob.glob(p.replace("*.parquet", "") + "*") or os.path.exists(
                p.replace("/*.parquet", "")):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    med, mn, loads = {}, {}, [os.getloadavg()[0]]
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle", file=sys.stderr)
            continue
        con.execute(sql).fetchall()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        med[name] = round(runs[1], 4)
        mn[name] = round(runs[0], 4)
        loads.append(os.getloadavg()[0])
    out = {"metric": "duckdb_total", "value": round(sum(med.values()), 4),
           "unit": "sec", "queries": med, "queries_min": mn,
           "load_avg": [round(l, 2) for l in loads], "data": datadir}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
