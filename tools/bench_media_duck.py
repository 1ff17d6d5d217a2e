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


def banded(table, col, tau=7, nbands=8):
    bpb = 64 // nbands
    mask = (1 << bpb) - 1
    return f"""
WITH h AS (SELECT media_id, {col} AS ph
           FROM read_parquet('{table}/*.parquet') WHERE {col} IS NOT NULL),
b AS (SELECT media_id, ph, t.band,
             (ph >> (t.band * {bpb})) & {mask} AS bucket
      FROM h, unnest(generate_series(0, {nbands - 1})) AS t(band)),
cand AS (SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b,
                l.ph AS pa, r.ph AS pb
         FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket
                          AND l.media_id < r.media_id)
SELECT id_a, id_b, bit_count(xor(pa, pb)) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= {tau}"""


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


def keep_gate(hdir, surv=""):
    """the x86 cross-modal keep twin: union of the three pair sets,
    transitive closure by recursive CTE (the x16 oracle discipline —
    a correctness twin, not a tuned native CC), min-id kept. The reach
    table enumerates node×label per component, so a giant incidental
    component makes this blow up — exactly the claim the Spark side's
    star loop is priced against; the caller guards it with a timeout.
    `surv`: optional survivor-restriction predicate (the funnel's
    quality semi-join), e.g. "AND media_id IN (SELECT media_id FROM s)".
    """
    return f"""
ih AS (SELECT media_id, phash64 AS ph
       FROM read_parquet('{hdir}/img_hash.parquet/*.parquet')
       WHERE phash64 IS NOT NULL {surv}),
ah AS (SELECT media_id, audiofp64 AS ph
       FROM read_parquet('{hdir}/aud_fp.parquet/*.parquet')
       WHERE audiofp64 IS NOT NULL {surv}),
ib AS (SELECT media_id, ph, t.band, (ph >> (t.band * 8)) & 255 AS bucket
       FROM ih, unnest(generate_series(0, 7)) AS t(band)),
ab AS (SELECT media_id, ph, t.band, (ph >> (t.band * 8)) & 255 AS bucket
       FROM ah, unnest(generate_series(0, 7)) AS t(band)),
ip AS (SELECT DISTINCT l.media_id AS da, r.media_id AS db
       FROM ib l JOIN ib r ON l.band = r.band AND l.bucket = r.bucket
                          AND l.media_id < r.media_id
       WHERE bit_count(xor(l.ph, r.ph)) <= 7),
ap AS (SELECT DISTINCT l.media_id AS da, r.media_id AS db
       FROM ab l JOIN ab r ON l.band = r.band AND l.bucket = r.bucket
                          AND l.media_id < r.media_id
       WHERE bit_count(xor(l.ph, r.ph)) <= 7),
fh AS (SELECT DISTINCT media_id, fphash64 AS h
       FROM read_parquet('{hdir}/vid_hash.parquet/*.parquet')
       WHERE 1=1 {surv}),
n AS (SELECT media_id, count(*) AS nh FROM fh GROUP BY 1),
ov AS (SELECT a.media_id AS da, b.media_id AS db, count(*) AS o
       FROM fh a JOIN fh b ON a.h = b.h AND a.media_id < b.media_id
       GROUP BY 1, 2),
vp AS (SELECT o.da, o.db FROM ov o
       JOIN n na ON na.media_id = o.da JOIN n nb ON nb.media_id = o.db
       WHERE CAST(o.o AS DOUBLE) / least(na.nh, nb.nh) >= 0.5),
ids AS (SELECT media_id FROM ih UNION ALL SELECT media_id FROM ah
        UNION ALL SELECT DISTINCT media_id FROM fh),
cand AS (SELECT * FROM ip UNION ALL SELECT * FROM ap
         UNION ALL SELECT * FROM vp),
edges AS (SELECT da AS src, db AS dst FROM cand
          UNION SELECT db, da FROM cand),
reach(media_id, lbl) AS (
    SELECT media_id, media_id FROM ids
    UNION
    SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.media_id = e.dst),
comp AS (SELECT media_id, min(lbl) AS cluster_id FROM reach GROUP BY 1)"""


def keep_gate_full(hdir):
    return ("WITH RECURSIVE " + keep_gate(hdir).strip() + """
SELECT media_id, cluster_id, media_id = cluster_id AS keep FROM comp""")


def funnel(hdir):
    """the x91 twin: the x88 first-failing-rule CASE over the stored
    decode-stats artifact, then the keep-gate closure restricted to the
    quality survivors, rolled up per (stage, kind). Thresholds mirror
    graft.llm.Multimodal's MinImageArea/Exposure/Silence/Hot/MinClipMs
    constants verbatim.
    """
    surv = "AND media_id IN (SELECT media_id FROM surv)"
    return f"""
WITH RECURSIVE
q AS (SELECT media_id, kind,
  CASE WHEN dec_brightness IS NULL AND dec_amp_mean IS NULL
            AND dec_duration_ms IS NULL THEN 'undecodable'
       WHEN kind = 'image' AND dec_width * dec_height < 256
            THEN 'too_small'
       WHEN kind = 'image' AND (dec_brightness < 0.15
            OR dec_brightness > 0.92) THEN 'exposure'
       WHEN kind = 'audio' AND dec_amp_mean < 0.01 THEN 'silence'
       WHEN kind = 'audio' AND dec_amp_mean > 0.45 THEN 'clipping_risk'
       WHEN kind = 'video' AND dec_duration_ms < 3000 THEN 'too_short'
       ELSE 'pass' END AS reason
  FROM read_parquet('{hdir}/stats.parquet/*.parquet')),
surv AS (SELECT media_id FROM q WHERE reason = 'pass'),
{keep_gate(hdir, surv).strip()},
dedup AS (SELECT c.media_id, q.kind, c.media_id = c.cluster_id AS keep
          FROM comp c JOIN q USING (media_id))
SELECT 'quality' AS stage, kind, count(*) AS n_in,
       sum(CASE WHEN reason = 'pass' THEN 1 ELSE 0 END) AS n_kept
FROM q GROUP BY 2
UNION ALL
SELECT 'dedup', kind, count(*),
       sum(CASE WHEN keep THEN 1 ELSE 0 END)
FROM dedup GROUP BY 2"""


def main():
    hdir = sys.argv[1]
    timeout = float(os.environ.get("MEDIA_DUCK_TIMEOUT", "600"))
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    queries = {
        "nd_img": banded(f"{hdir}/img_hash.parquet", "phash64"),
        "nd_img_wide": banded(f"{hdir}/img_hash.parquet", "phash64",
                              tau=3, nbands=4),
        "nd_aud": banded(f"{hdir}/aud_fp.parquet", "audiofp64"),
        "nd_aud_wide": banded(f"{hdir}/aud_fp.parquet", "audiofp64",
                              tau=3, nbands=4),
        "nd_vid": containment(f"{hdir}/vid_hash.parquet"),
        "nd_keep": keep_gate_full(hdir),
        "funnel": funnel(hdir),
    }
    only = os.environ.get("MEDIA_DUCK_ONLY")
    if only:
        import re
        queries = {k: v for k, v in queries.items() if re.search(only, k)}
    med, mn, pairs = {}, {}, {}
    loads = [os.getloadavg()[0]]
    for name, sql in queries.items():
        import threading
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            pairs[name] = len(con.execute(sql).fetchall())  # warm-up
        except Exception as e:
            timer.cancel()
            med[name] = None
            mn[name] = None
            pairs[name] = None
            print(f"DNF {name}: {type(e).__name__} after {timeout}s",
                  file=sys.stderr)
            continue
        timer.cancel()
        runs = []
        for _ in range(3):
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            except Exception:
                runs.append(timeout)
            finally:
                timer.cancel()
        runs.sort()
        med[name] = round(runs[1], 4)
        mn[name] = round(runs[0], 4)
        loads.append(os.getloadavg()[0])
    done = [v for v in med.values() if v is not None]
    print(json.dumps({
        "metric": "media_duckdb_total", "value": round(sum(done), 4),
        "unit": "sec", "queries": med, "queries_min": mn, "pairs": pairs,
        "load_avg": [round(l, 2) for l in loads], "hash_dir": hdir}))


if __name__ == "__main__":
    main()
