#!/usr/bin/env python3
"""DuckDB timing twin of graft.MediaBench's near-dup search phase.

Runs the SAME banded-hamming / frame-containment algorithms in DuckDB
SQL over the SAME stored hash parquet the Spark phases read (the
`hash_dir` reported in media_bench_out.json). The extraction phase has
no twin — a SQL engine has no PNG/WAV/MP4 codec; that phase is a
Spark-only capability measured in MB/s.

Usage: python3 tools/bench_media_duck.py <hashDir>
"""
import sys, json, time, os
import duckdb


def banded(table, col):
    return f"""
WITH h AS (SELECT media_id, {col} AS ph
           FROM read_parquet('{table}/*.parquet') WHERE {col} IS NOT NULL),
b AS (SELECT media_id, ph, t.band, (ph >> (t.band * 8)) & 255 AS bucket
      FROM h, unnest(generate_series(0, 7)) AS t(band)),
cand AS (SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b,
                l.ph AS pa, r.ph AS pb
         FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket
                          AND l.media_id < r.media_id)
SELECT id_a, id_b, bit_count(xor(pa, pb)) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= 7"""


def containment(table):
    return f"""
WITH fh AS (SELECT DISTINCT media_id, fphash64 AS h
            FROM read_parquet('{table}/*.parquet')),
n AS (SELECT media_id, count(*) AS nh FROM fh GROUP BY 1),
ov AS (SELECT a.media_id AS id_a, b.media_id AS id_b, count(*) AS overlap
       FROM fh a JOIN fh b ON a.h = b.h AND a.media_id < b.media_id
       GROUP BY 1, 2)
SELECT o.id_a, o.id_b, o.overlap,
       CAST(o.overlap AS DOUBLE) / least(na.nh, nb.nh) AS sim
FROM ov o
JOIN n na ON na.media_id = o.id_a
JOIN n nb ON nb.media_id = o.id_b
WHERE CAST(o.overlap AS DOUBLE) / least(na.nh, nb.nh) >= 0.5"""


def main():
    hdir = sys.argv[1]
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    queries = {
        "nd_img": banded(f"{hdir}/img_hash.parquet", "phash64"),
        "nd_aud": banded(f"{hdir}/aud_fp.parquet", "audiofp64"),
        "nd_vid": containment(f"{hdir}/vid_hash.parquet"),
    }
    med, mn, pairs = {}, {}, {}
    loads = [os.getloadavg()[0]]
    for name, sql in queries.items():
        pairs[name] = len(con.execute(sql).fetchall())  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        med[name] = round(runs[1], 4)
        mn[name] = round(runs[0], 4)
        loads.append(os.getloadavg()[0])
    print(json.dumps({
        "metric": "media_duckdb_total", "value": round(sum(med.values()), 4),
        "unit": "sec", "queries": med, "queries_min": mn, "pairs": pairs,
        "load_avg": [round(l, 2) for l in loads], "hash_dir": hdir}))


if __name__ == "__main__":
    main()
