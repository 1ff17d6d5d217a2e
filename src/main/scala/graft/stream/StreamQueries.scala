package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** Streaming query surface (T3-T6) with batch-SQL oracles: each streaming
  * run with `Trigger.AvailableNow` is deterministic, so its output equals
  * a batch computation DuckDB can replicate — including the append-mode
  * session query, whose oracle applies the same watermark-closure rule
  * the streaming engine does.
  */
object StreamQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st01_tumbling_counts" -> ((s, dir) => StreamOps.tumblingCounts(s, dir)),
    "st02_session_windows" -> ((s, dir) => StreamOps.sessionCounts(s, dir)),
    "st03_stream_dedup" -> ((s, dir) => StreamOps.dedupKeys(s, dir)),
    "st04_incremental_health" -> ((s, _) =>
      IncrementalHealth.run(s, graft.meta.FixtureCatalog.DefaultDir)),
    "st05_sliding_counts" -> ((s, dir) => StreamOps.slidingCounts(s, dir)),
    "st06_enriched_counts" -> ((s, dir) => StreamOps.enrichedCounts(s, dir)),
    "st07_stream_stream_join" -> ((s, dir) =>
      StreamOps.clickPurchaseJoin(s, dir)),
    "st08_stream_clean_docs" -> ((s, dir) => StreamOps.cleanDocs(s, dir)),
    "st09_decontam_gate" -> ((s, dir) => StreamOps.decontamGate(s, dir)),
    "st10_dsir_gate" -> ((s, dir) => StreamOps.dsirGate(s, dir)),
    "st11_ingest_dedup_gate" -> ((s, dir) =>
      StreamOps.ingestDedupGate(s, dir)),
    "st12_emb_ingest_gate" -> ((s, dir) =>
      StreamOps.embIngestGate(s, dir)),
    "st13_quality_gate" -> ((s, dir) =>
      StreamOps.qualityGateStream(s, dir)),
    "st14_bloom_gate" -> ((s, dir) =>
      StreamOps.bloomGateStream(s, dir)),
    "st15_takedown_gate" -> ((s, dir) =>
      StreamOps.takedownGateStream(s, dir)),
    "st16_drift_monitor" -> ((s, dir) =>
      StreamOps.driftMonitorStream(s, dir, headK = DriftHeadK)),
    "st17_takedown_cluster_gate" -> ((s, dir) =>
      StreamOps.takedownClusterGateStream(s, dir)),
    "st18_budget_gate" -> ((s, dir) => StreamOps.budgetGateStream(s, dir)),
    // the STORED-artifact twins of st09/st17 (r11 verdict task 5): the
    // batch-side index/cluster build happens ONCE into a parquet
    // artifact (the bench's warm-up pass pays it; timed runs measure
    // only artifact-load + stream), so these rows price the production
    // path — literal resolution off the stored artifact — while
    // st09/st17 keep pricing the in-stream-rebuild demo path
    "st19_decontam_gate_stored" -> ((s, dir) =>
      StreamOps.decontamGateStreamWith(s, dir,
        artifact(s, dir, "decontam_index", "minhash.bands.eval10") {
          import org.apache.spark.sql.functions.col
          graft.llm.Dedup.bandsInRow(
              graft.core.Tables.load(s, dir, "documents")
                .filter(col("doc_id") % 10 === 0))
            .select(col("band"), col("bh"), col("doc_id").as("eval_id"))
        })),
    "st20_takedown_cluster_stored" -> ((s, dir) =>
      StreamOps.takedownClusterGateStreamWith(s, dir,
        artifact(s, dir, "dup_clusters", "dupClusters.default") {
          graft.llm.Dedup.dupClusters(
            graft.core.Tables.load(s, dir, "documents"))
        })),
    // the per-doc FLAG form of st09/st19 — doc-sized output at any
    // duplication factor (the r13 ×100 scalable shape), off the same
    // stored band-index artifact as st19
    "st21_decontam_flag_stored" -> ((s, dir) =>
      StreamOps.decontamFlagStreamWith(s, dir,
        artifact(s, dir, "decontam_index", "minhash.bands.eval10") {
          import org.apache.spark.sql.functions.col
          graft.llm.Dedup.bandsInRow(
              graft.core.Tables.load(s, dir, "documents")
                .filter(col("doc_id") % 10 === 0))
            .select(col("band"), col("bh"), col("doc_id").as("eval_id"))
        })),
    // the streaming PERCEPTUAL ingest gate (the media twin of st19):
    // catalog pHash table stored once as an artifact, uploads decode +
    // hash in-flight and probe it by banded hamming
    "st22_media_phash_gate" -> ((s, _) =>
      StreamOps.mediaPhashGateStream(s, graft.llm.LlmQueries.MEDIA,
        artifact(s, graft.llm.LlmQueries.MEDIA, "media_phash",
          s"imagePhash.catalog${StreamOps.MediaGateSplit}") {
          import org.apache.spark.sql.functions.col
          graft.llm.Multimodal.imagePhash(
              s.read.parquet(s"${graft.llm.LlmQueries.MEDIA}/media.parquet"))
            .filter(col("media_id") < StreamOps.MediaGateSplit &&
              col("phash64").isNotNull)
        })),
    // the streaming media QUALITY gate (the st13 discipline on the
    // media side): x88's decode + projection unchanged on the stream
    "st23_media_quality_gate" -> ((s, _) =>
      StreamOps.mediaQualityGateStream(s, graft.llm.LlmQueries.MEDIA))
  )

  private def artifact(spark: SparkSession, dir: String, name: String,
      recipe: String)(build: => DataFrame): DataFrame =
    graft.sources.ArtifactStore.cached(spark, dir, name, recipe)(build)

  /** head-vocabulary cut shared by the st16 registration and its oracle
    * (the x37/DsirBuckets discipline: interpolate shared constants into
    * the oracle SQL so the two sides cannot silently desynchronize)
    */
  private val DriftHeadK = 50

  private val baseOracles: Map[String, String] = Map(
    "st01_tumbling_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
         event_type, count(*) AS n
         FROM events GROUP BY 1, 2, 3""",

    // sessions: gaps-and-islands with the streaming boundary rule (a new
    // session starts when the gap is >= 30 min — session windows are
    // [start, end)), emitted only once CLOSED by the final watermark
    // (end <= max event time), mirroring append-mode semantics
    "st02_session_windows" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
         b AS (SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         g AS (SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
               FROM b),
         sess AS (SELECT user_id, min(ts) AS session_start,
                    max(ts) + INTERVAL 30 MINUTE AS session_end,
                    count(*) AS n
                  FROM g GROUP BY user_id, sid)
         SELECT session_start, session_end, user_id, n FROM sess
         WHERE session_end <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)""",

    "st03_stream_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    // sliding windows: every event lands in the 4 hour-long windows whose
    // starts are the 15-min buckets at offsets 0..3 behind it
    "st05_sliding_counts" ->
      """WITH w AS (
           SELECT CAST(time_bucket(INTERVAL 15 MINUTE, ts)
                    - k.k * INTERVAL 15 MINUTE AS TIMESTAMP) AS window_start,
                  event_type
           FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) k)
         SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type, count(*) AS n
         FROM w GROUP BY 1, 2, 3""",

    // stream-static enrichment: the dim is the same VALUES table, decimal
    // value sums match the batch money discipline
    "st06_enriched_counts" ->
      """WITH dim(event_type, category) AS (VALUES
           ('click', 'engagement'), ('view', 'engagement'),
           ('signup', 'acquisition'), ('purchase', 'revenue'),
           ('error', 'reliability'))
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
             AS window_end,
           category, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events JOIN dim USING (event_type)
         GROUP BY 1, 2, 3""",

    // final state of the incremental fold == batch aggregation over the
    // same metadata fixture (op inference mirrors Normalize)
    "st04_incremental_health" ->
      s"""WITH s AS (
           SELECT catalog, namespace, name, ts_ms,
             CASE WHEN summary IS NULL THEN 'unknown' ELSE coalesce(
               summary['operation'][1],
               CASE WHEN len(summary['spark.app.id'])>0 THEN 'append' END,
               CASE WHEN len(summary['added-data-files'])>0 OR len(summary['added-records'])>0 THEN 'append' END,
               CASE WHEN len(summary['deleted-data-files'])>0 OR len(summary['deleted-records'])>0 THEN 'delete' END,
               CASE WHEN len(summary['total-data-files'])>0 THEN 'overwrite' END,
               'append') END AS op
           FROM read_parquet('${graft.meta.FixtureCatalog.DefaultDir}/snapshots.parquet/*.parquet'))
         SELECT catalog, namespace, name, count(*) AS n_snapshots,
           CAST(sum(CASE WHEN op = 'append' THEN 1 ELSE 0 END) AS BIGINT) AS n_append,
           CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
           CAST(sum(CASE WHEN op = 'overwrite' THEN 1 ELSE 0 END) AS BIGINT) AS n_overwrite,
           CAST(sum(CASE WHEN op LIKE '%rewrite%' OR op LIKE '%compact%' THEN 1 ELSE 0 END) AS BIGINT) AS n_compaction,
           max(ts_ms) AS max_ts_ms
         FROM s GROUP BY 1, 2, 3""",

    // stream-stream interval join == the batch interval join over the
    // same bounded input (inner join, so no null-padding timing effects)
    "st07_stream_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           p.event_id AS purchase_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts, p.value
         FROM events c JOIN events p ON c.user_id = p.user_id
           AND c.event_type = 'click' AND p.event_type = 'purchase'
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""",

    // stateless in-flight cleaning == the x29 batch redaction over the
    // same bounded input (same injection, same engine-portable regexes)
    "st08_stream_clean_docs" ->
      s"""WITH inj AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 3 = 0 THEN ' reach me at user'
               || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN ' or call +1-555-'
               || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0042'
               ELSE '' END AS text
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '${graft.llm.TextOps.EmailRe}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text,
             '${graft.llm.TextOps.PhoneRe}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(text,
             '${graft.llm.TextOps.EmailRe}', '[EMAIL]', 'g'),
             '${graft.llm.TextOps.PhoneRe}', '[PHONE]', 'g') AS redacted
         FROM inj""",

    // stream-static decontamination gate == x36's band collision join
    // over the same bounded input, at band granularity (the stream's
    // in-row signatures are bit-identical to the grouped batch path —
    // DedupSpec asserts the equivalence); SIG_CTE's cand goes unused
    "st09_decontam_gate" ->
      s"""WITH ${graft.llm.LlmQueries.SIG_CTE}
          SELECT t.doc_id, t.band, t.bh, e.doc_id AS eval_id
          FROM bands t JOIN bands e ON t.band = e.band AND t.bh = e.bh
          WHERE t.doc_id % 10 != 0 AND e.doc_id % 10 = 0""",

    // batch-fit/stream-score DSIR == the x43 batch computation over the
    // same bounded input: the fitted ratio literal makes the streaming
    // side a pure projection, so the appended rows are exactly x43's
    "st10_dsir_gate" -> graft.llm.LlmQueries.DsirSql,

    // streaming ingest gate == x50's dup_vs_corpus at band granularity:
    // batch docs' band rows that exist in the corpus bucket-key set
    "st11_ingest_dedup_gate" ->
      s"""WITH ${graft.llm.LlmQueries.SIG_CTE}
          SELECT t.doc_id, t.band, t.bh
          FROM bands t
          WHERE t.doc_id % 10 = 0 AND EXISTS (
            SELECT 1 FROM bands c
            WHERE c.doc_id % 10 != 0
              AND c.band = t.band AND c.bh = t.bh)""",

    // streaming embedding ingest gate == the band-collision half of
    // x57 over the same bounded input: batch vectors' band rows whose
    // (band, bucket) exists in the corpus slice's key set
    "st12_emb_ingest_gate" ->
      s"""WITH ${graft.llm.LlmQueries.VecBbCte}
          SELECT t.vec_id, t.band, t.bucket
          FROM bb t
          WHERE t.vec_id % 10 = 0 AND EXISTS (
            SELECT 1 FROM bb c
            WHERE c.vec_id % 10 != 0
              AND c.band = t.band AND c.bucket = t.bucket)""",

    // streaming quality gate == x26 over the same bounded input: the
    // gate is a pure stateless projection, so the streamed memory table
    // equals the batch run row-for-row — the oracle IS x26's (shared
    // string: the two surfaces cannot drift)
    "st13_quality_gate" ->
      graft.llm.LlmQueries.oracles("x26_quality_gate"),

    // streaming Bloom gate == x64's membership half over the same
    // bounded input (same md5-seeded positions, same distinct-count
    // all-present rule) — the exact check is the batch side's job
    "st14_bloom_gate" -> {
      def pos =
        s"""((('0x' || substr(fp, 1, 8))::BIGINT
              + j.j * ('0x' || substr(fp, 9, 8))::BIGINT) % 65536)"""
      s"""WITH corp AS (SELECT doc_id, md5(text) AS fp FROM documents
                        WHERE doc_id % 10 != 0),
          newb AS (SELECT doc_id, md5(text) AS fp FROM documents
                   WHERE doc_id % 10 = 0),
          cpos AS (SELECT DISTINCT $pos AS pos
                   FROM corp, unnest(generate_series(1, 3)) AS j(j)),
          bpos AS (SELECT DISTINCT doc_id, fp, $pos AS pos
                   FROM newb, unnest(generate_series(1, 3)) AS j(j)),
          g AS (SELECT doc_id, count(*) AS n_pos,
                  sum(CASE WHEN cpos.pos IS NOT NULL THEN 1 ELSE 0 END)
                    AS n_hit
                FROM bpos LEFT JOIN cpos ON bpos.pos = cpos.pos
                GROUP BY 1)
          SELECT doc_id, (n_hit = n_pos) AS maybe_dup FROM g"""
    },

    // streaming takedown gate == x67's content-match half over the full
    // documents stream (same normalized fp; direct ids match their own
    // fp, so the named docs are refused too) — cluster propagation is
    // the batch side's job
    "st15_takedown_gate" ->
      """WITH f AS (SELECT DISTINCT
             md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp
           FROM documents WHERE doc_id % 41 = 0),
         n AS (SELECT doc_id,
             md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fp
           FROM documents)
         SELECT n.doc_id,
           CASE WHEN f.fp IS NOT NULL THEN 'forget' ELSE 'ingest' END
             AS action
         FROM n LEFT JOIN f ON n.fp = f.fp""",

    // streaming drift monitor == the head-vocab-pinned chi-square over
    // the same bounded input: reference head fit on the even slice
    // (count desc, tok asc — the deterministic top-K cut), stream
    // counts on the odd slice restricted to that vocabulary, zero rows
    // kept by the left join, x54's fixed-order double arithmetic
    "st16_drift_monitor" ->
      s"""WITH toks AS (
           SELECT doc_id, x.i AS pos, tk[x.i] AS tok
           FROM (SELECT doc_id, string_split(text, ' ') AS tk
                 FROM documents) t,
                unnest(generate_series(1, len(tk))) AS x(i)),
         ca AS (SELECT tok, count(*) AS c FROM toks
                WHERE doc_id % 2 = 0 GROUP BY 1),
         hd AS (SELECT tok, CAST(c AS BIGINT) AS c_ref,
                  row_number() OVER (ORDER BY c DESC, tok) AS rn
                FROM ca),
         h AS (SELECT tok, c_ref FROM hd WHERE rn <= $DriftHeadK),
         cb AS (SELECT tok, count(*) AS c FROM toks
                WHERE doc_id % 2 = 1 GROUP BY 1),
         m AS (SELECT h.tok, h.c_ref,
                 CAST(coalesce(cb.c, 0) AS BIGINT) AS c_new
               FROM h LEFT JOIN cb ON h.tok = cb.tok),
         tot AS (SELECT CAST(sum(c_ref) AS BIGINT) AS n_ref,
                   CAST(sum(c_new) AS BIGINT) AS n_new FROM m),
         e AS (SELECT tok, c_ref, c_new,
                 CAST(c_ref + c_new AS DOUBLE) * CAST(n_ref AS DOUBLE) /
                   CAST(n_ref + n_new AS DOUBLE) AS e_ref,
                 CAST(c_ref + c_new AS DOUBLE) * CAST(n_new AS DOUBLE) /
                   CAST(n_ref + n_new AS DOUBLE) AS e_new
               FROM m, tot)
         SELECT tok, c_ref, c_new,
           (CASE WHEN e_ref > 0 THEN (CAST(c_ref AS DOUBLE) - e_ref)
               * (CAST(c_ref AS DOUBLE) - e_ref) / e_ref ELSE 0.0 END)
           + (CASE WHEN e_new > 0 THEN (CAST(c_new AS DOUBLE) - e_new)
               * (CAST(c_new AS DOUBLE) - e_new) / e_new ELSE 0.0 END)
             AS chi2
         FROM e""",

    // st18: x74's greedy-prefix kept set re-read as an admit/skip
    // action — the batch-fitted (score, id) threshold and the oracle's
    // global ranked prefix agree exactly on the fit corpus
    "st18_budget_gate" ->
      s"""WITH x74 AS (${graft.llm.LlmQueries.oracles("x74_budget_select")})
         SELECT doc_id, CASE WHEN kept THEN 'train' ELSE 'skip' END
           AS action
         FROM x74""",

    // st17: every incoming doc tagged by the STORED cluster assignment
    // (the x67 production path's broadcast set, here a literal map):
    // forget if its near-dup cluster contains a forgotten doc, else
    // ingest — the oracle recomputes cluster membership recursively
    // from the candidate-pair graph exactly like x16's closure
    "st17_takedown_cluster_gate" ->
      s"""WITH RECURSIVE ${graft.llm.LlmQueries.SIG_CTE},
         edges AS (
           SELECT doc_a AS src, doc_b AS dst FROM cand
           UNION SELECT doc_b, doc_a FROM cand),
         reach(doc_id, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.src, r.lbl FROM edges e JOIN reach r
             ON r.doc_id = e.dst),
         comp AS (SELECT doc_id, min(lbl) AS cluster_id
                  FROM reach GROUP BY 1),
         forget AS (SELECT doc_id FROM documents WHERE doc_id % 41 = 0),
         bad AS (SELECT DISTINCT cluster_id
                 FROM comp JOIN forget USING (doc_id))
         SELECT c.doc_id,
           CASE WHEN b.cluster_id IS NOT NULL THEN 'forget'
             ELSE 'ingest' END AS action
         FROM comp c LEFT JOIN bad b USING (cluster_id)"""
  )

  /** the stored-artifact twins are row-equal to the rebuild paths by
    * construction (same in-stream plan, same artifact values), so they
    * share the st09/st17 oracles verbatim
    */
  override val oracles: Map[String, String] = baseOracles ++ Map(
    "st19_decontam_gate_stored" -> baseOracles("st09_decontam_gate"),
    "st20_takedown_cluster_stored" ->
      baseOracles("st17_takedown_cluster_gate"),
    // the flag gate = DISTINCT doc_id over st09's collision set
    "st21_decontam_flag_stored" ->
      s"""WITH ${graft.llm.LlmQueries.SIG_CTE}
          SELECT DISTINCT t.doc_id
          FROM bands t
          WHERE t.doc_id % 10 != 0 AND EXISTS (
            SELECT 1 FROM bands e
            WHERE e.doc_id % 10 = 0
              AND e.band = t.band AND e.bh = t.bh)""",
    // the perceptual gate's oracle reads the fixture's AUTHORED
    // phash64 (x80's oracle proves engine hash == authored hash); the
    // band probe is recall-exact for tau < nBands, so the pair set
    // equals the brute tau-join
    "st22_media_phash_gate" ->
      s"""SELECT u.media_id, c.media_id AS corpus_id,
            CAST(bit_count(xor(u.phash64, c.phash64)) AS INT) AS hamming
          FROM read_parquet('${graft.llm.LlmQueries.MEDIA}/media.parquet/*.parquet') u,
            read_parquet('${graft.llm.LlmQueries.MEDIA}/media.parquet/*.parquet') c
          WHERE u.media_id >= ${StreamOps.MediaGateSplit}
            AND c.media_id < ${StreamOps.MediaGateSplit}
            AND u.phash64 IS NOT NULL AND c.phash64 IS NOT NULL
            AND bit_count(xor(u.phash64, c.phash64)) <= 7""",
    // shared VERBATIM with the batch gate (the st13/x26 discipline)
    "st23_media_quality_gate" ->
      graft.llm.LlmQueries.oracles("x88_media_quality_gate"))
}
