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
import sys, json, time, os, glob, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the media oracles read the committed 31-row fixture at its absolute
# path (the correctness contract); when the bench dir carries a staged
# sf-scale media table (graft.llm.MediaCorpus writes the same schema
# incl. the authored expected columns), rewrite the path so the twin
# races the SAME rows the Spark bench read
MEDIA_FIXTURE = "/root/repo/fixtures/media/media.parquet"


def main():
    datadir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    # media-family amplified oracles are brute-force/recursive-CTE by
    # design (candidate volume grows ~n²); a DNF at the cap IS the
    # measured result, like the x86 twin's
    timeout = float(os.environ.get("DUCK_TIMEOUT", "900"))
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
    staged_media = f"{datadir}/media.parquet"
    remap_media = os.path.isdir(staged_media)

    def timed_run(sql):
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            return time.perf_counter() - t0
        finally:
            timer.cancel()

    med, mn, loads = {}, {}, [os.getloadavg()[0]]
    for name in names:
        sql = oracle.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle", file=sys.stderr)
            continue
        # st22/st23's Spark side is a file stream over the committed
        # fixture dir — their oracles stay on the fixture too
        if remap_media and not name.startswith("st"):
            sql = sql.replace(MEDIA_FIXTURE, staged_media)
        t0 = time.perf_counter()
        try:
            timed_run(sql)  # warm-up
        except Exception as e:
            # distinguish a timeout from an instant SQL error (r15
            # ADVICE): duckdb raises InterruptException on con.interrupt;
            # anything else (missing table, syntax) failed on its own
            elapsed = time.perf_counter() - t0
            med[name] = None
            mn[name] = None
            kind = ("timeout" if isinstance(
                e, duckdb.InterruptException) else "error")
            print(f"DNF {name}: {type(e).__name__} ({kind}) "
                  f"after {elapsed:.1f}s", file=sys.stderr)
            continue
        runs, capped = [], False
        for _ in range(3):
            try:
                runs.append(timed_run(sql))
            except Exception:
                runs.append(timeout)
                capped = True
                # the query is already a DNF — running the remaining
                # repeats would just burn the full cap again (r16 ADVICE)
                break
        if capped:
            # a timed run hitting the cap is a DNF too (r15 ADVICE):
            # summing the cap value with n_dnf=0 let `dnf==[]` read as
            # "every query finished" when it had not
            med[name] = None
            mn[name] = None
            print(f"DNF {name}: timed run hit the {timeout}s cap",
                  file=sys.stderr)
            continue
        runs.sort()
        med[name] = round(runs[1], 4)
        mn[name] = round(runs[0], 4)
        loads.append(os.getloadavg()[0])
        print(f"done {name}: med {med[name]}s", file=sys.stderr)
    # DNF entries carry None (JSON null) in the maps; the total sums the
    # finishers only and the dnf list names the rest — a timed-out twin
    # is a measured result, not a crash (the r15 x10 run lost an hour to
    # a None in this sum)
    finished = [v for v in med.values() if v is not None]
    out = {"metric": "duckdb_total", "value": round(sum(finished), 4),
           "unit": "sec", "queries": med, "queries_min": mn,
           "n_dnf": len(med) - len(finished),
           "dnf": sorted(k for k, v in med.items() if v is None),
           "load_avg": [round(l, 2) for l in loads], "data": datadir}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
