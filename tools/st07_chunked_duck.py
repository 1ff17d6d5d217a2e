#!/usr/bin/env python3
"""st07 matched-semantics DuckDB twin (r15 verdict task 3): force the
batch engine through the SAME incremental micro-batched stateful-join
semantics Spark's stream-stream interval join executes, instead of the
one-shot batch IE-join the plain twin runs.

Semantics per micro-batch (event-time-ordered chunks, K batches):
  1. append the chunk's clicks/purchases to the state tables
  2. emit the NEW join results only:  new_clicks x purchases_state
     UNION old_clicks x new_purchases  (exactly-once, no recompute)
  3. evict state beyond the watermark: clicks older than
     wm - 30min (can no longer match any live purchase), purchases
     older than wm (wm = max event ts seen - 1h, Spark's delay)

The one-shot twin answers "what does this JOIN cost"; this tool
answers "what do the join's STREAMING semantics cost a batch engine"
— the comparison st07's weak-entry adjudication needs.

Usage: st07_chunked_duck.py <dataDir> <K> [K...]
"""
import sys, time, os
import duckdb


def run_chunked(con, k):
    con.execute("DROP TABLE IF EXISTS c_state")
    con.execute("DROP TABLE IF EXISTS p_state")
    con.execute("DROP TABLE IF EXISTS out")
    con.execute("""CREATE TABLE c_state(user_id BIGINT, click_id BIGINT,
                   click_ts TIMESTAMP)""")
    con.execute("""CREATE TABLE p_state(user_id BIGINT, purchase_id BIGINT,
                   purchase_ts TIMESTAMP, value DOUBLE)""")
    con.execute("""CREATE TABLE out(user_id BIGINT, click_id BIGINT,
                   click_ts TIMESTAMP, purchase_id BIGINT,
                   purchase_ts TIMESTAMP, value DOUBLE)""")
    lo, hi = con.execute(
        "SELECT min(ts), max(ts) FROM ev").fetchone()
    span = (hi - lo) / k
    for i in range(k):
        b_lo = lo + i * span
        b_hi = hi if i == k - 1 else lo + (i + 1) * span
        bound = "ts <= ?" if i == k - 1 else "ts < ?"
        # 1. the chunk, split by role
        con.execute(f"""CREATE OR REPLACE TEMP TABLE new_c AS
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM ev WHERE event_type = 'click' AND ts >= ? AND {bound}""",
            [b_lo, b_hi])
        con.execute(f"""CREATE OR REPLACE TEMP TABLE new_p AS
            SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                   value
            FROM ev WHERE event_type = 'purchase' AND ts >= ? AND {bound}""",
            [b_lo, b_hi])
        # 2. incremental emit: new clicks against ALL purchases (state +
        # new), old state clicks against new purchases — each result
        # pair produced exactly once
        con.execute("""INSERT INTO out
            SELECT c.user_id, c.click_id, c.click_ts,
                   p.purchase_id, p.purchase_ts, p.value
            FROM new_c c JOIN (SELECT * FROM p_state UNION ALL
                               SELECT * FROM new_p) p
              ON c.user_id = p.user_id
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE""")
        con.execute("""INSERT INTO out
            SELECT c.user_id, c.click_id, c.click_ts,
                   p.purchase_id, p.purchase_ts, p.value
            FROM c_state c JOIN new_p p
              ON c.user_id = p.user_id
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE""")
        # 3. state update + watermark eviction (1h delay, Spark's)
        con.execute("INSERT INTO c_state SELECT * FROM new_c")
        con.execute("INSERT INTO p_state SELECT * FROM new_p")
        con.execute("""DELETE FROM c_state WHERE click_ts <
            ? - INTERVAL 1 HOUR - INTERVAL 30 MINUTE""", [b_hi])
        con.execute("""DELETE FROM p_state WHERE purchase_ts <
            ? - INTERVAL 1 HOUR""", [b_hi])
    return con.execute("SELECT count(*) FROM out").fetchone()[0]


def main():
    datadir = sys.argv[1]
    ks = [int(x) for x in sys.argv[2:]] or [1, 4, 16, 64]
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    p = f"{datadir}/events.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"""CREATE TABLE ev AS
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value FROM '{p}'""")
    # the one-shot batch IE-join reference point
    t0 = time.perf_counter()
    n_batch = con.execute("""SELECT count(*) FROM ev c JOIN ev pp
        ON c.user_id = pp.user_id AND c.event_type = 'click'
       AND pp.event_type = 'purchase' AND pp.ts >= c.ts
       AND pp.ts <= c.ts + INTERVAL 30 MINUTE""").fetchone()[0]
    print(f"oneshot: {time.perf_counter() - t0:.3f} s  rows={n_batch}")
    for k in ks:
        runs = []
        n = None
        for _ in range(3):
            t0 = time.perf_counter()
            n = run_chunked(con, k)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        ok = "OK" if n == n_batch else f"ROWS MISMATCH {n} != {n_batch}"
        print(f"chunked k={k:4d}: med {runs[1]:.3f} s  min {runs[0]:.3f} s"
              f"  rows={n}  {ok}")


if __name__ == "__main__":
    main()
