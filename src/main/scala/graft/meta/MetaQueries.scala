package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.analytics.Health
import graft.ops.MetaOps

/** Layer-A query surface (SURVEY §2.1-§2.8 metadata rows): every operator
  * of the reference's catalog/metadata/analytics domain exposed as a
  * driver-checkable query over the golden fixtures, with a DuckDB oracle
  * that mirrors the Spark computation formula-for-formula (same truncating
  * duration math, same double-arithmetic order) so results are bit-exact.
  *
  * Oracle SQL reads the fixture parquet by absolute path — the fixtures
  * are committed to the repo and scale-invariant, unlike the sf tables.
  */
object MetaQueries extends QueryPack {

  private val F = graft.meta.FixtureCatalog.DefaultDir
  private val A = Model.AsOfMs
  private val cat = graft.meta.FixtureCatalog.default
  // S1/S2 client path: same population served through the Iceberg REST
  // wire format (RestWire parse of LoadTableResponse et al.), so m23/m24
  // drive the full catalog-connect path minus transport through the
  // same DuckDB oracles as their parquet-fixture twins.
  private val restCat = RestPayloadCatalog.default
  // S2 client path: the Glue-typed subset of the population served
  // through the AWS Glue wire format (GlueWire GetDatabases/GetTables +
  // the Iceberg TableMetadata file each metadata_location points at),
  // so m25/m26 drive the Glue catalog-connect path minus the SigV4
  // transport through catalog-filtered twins of the same oracles.
  private val glueCat = GluePayloadCatalog.default
  private val key = Seq("catalog", "namespace", "name")

  // time-travel pin: 3 days before asOf
  private val TravelMs = A - 3L * 86400000L
  // m03 filter params (F1-F4)
  private val filterParams = MetaOps.SnapshotFilterParams(
    operationTypes = Seq("append", "overwrite", "delete"),
    filesAddedMin = Some(10L), filesAddedMax = Some(150L),
    recordsAddedMin = Some(100L), recordsAddedMax = Some(10000L),
    dateStart = Some("2025-05-25"), dateEnd = Some("2025-05-31"))
  private val treeQueries = Seq("ml", "train", "sales", "glue", "zzz")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_list_tables" -> ((s, _) => {
      cat.listing(s)
        .withColumn("full_name",
          Normalize.fullName(col("namespace"), col("table_name")))
        .withColumn("is_iceberg", col("table_type") === "iceberg")
    }),

    "m02_snapshot_normalize" -> ((s, _) => {
      cat.snapshots(s).select(
        col("catalog"), col("namespace"), col("name"), col("snapshot_id"),
        col("ts"), col("op"), col("records_added"), col("size_change"),
        coalesce(col("added_files"), lit(0L)).as("added_files_n"),
        coalesce(col("total_size_bytes"), lit(0.0)).as("total_size_b"))
    }),

    "m03_snapshot_filters" -> ((s, _) => {
      cat.snapshots(s)
        .filter(MetaOps.snapshotFilter(filterParams))
        .select(col("catalog"), col("namespace"), col("name"),
          col("snapshot_id"), col("op"), col("ts"))
    }),

    "m04_op_distribution" -> ((s, _) => {
      cat.snapshots(s)
        .groupBy((key :+ "op").map(col): _*)
        .agg(count(lit(1)).as("n"))
    }),

    "m05_windowed_activity" -> ((s, _) => {
      metrics(s).select(key.map(col) ++ Seq(col("last_hour"),
        col("last_day"), col("last_week"), col("avg_snapshots_per_hour"),
        col("peak_snapshots_per_hour")): _*)
    }),

    "m06_time_span" -> ((s, _) => {
      cat.snapshots(s).groupBy(key.map(col): _*)
        .agg(count(lit(1)).as("n"),
          timestamp_millis(min(col("ts_ms"))).as("first_ts"),
          timestamp_millis(max(col("ts_ms"))).as("last_ts"),
          floor((max(col("ts_ms")) - min(col("ts_ms"))) / 86400000L)
            .as("span_days"))
    }),

    "m07_latest_state" -> ((s, _) => {
      metrics(s).select(key.map(col) ++ Seq(col("total_files"),
        col("total_size_bytes"), col("avg_file_size_mb")): _*)
    }),

    "m08_file_distribution" -> ((s, _) => {
      metrics(s).select(key.map(col) ++ Seq(col("tiny_files"),
        col("small_files"), col("optimal_files"), col("large_files"),
        col("small_files_count"), col("small_file_ratio")): _*)
    }),

    "m09_compaction" -> ((s, _) => {
      metrics(s).select(key.map(col) ++ Seq(col("compactions"),
        col("days_since_compaction"), col("avg_compaction_frequency_days"),
        col("compaction_effectiveness")): _*)
    }),

    "m10_storage" -> ((s, _) => {
      metrics(s).select(key.map(col) ++ Seq(col("total_size_gb"),
        col("storage_growth_rate_gb_per_day"), col("delete_ratio"),
        col("update_ratio"), col("data_freshness_hours"),
        col("partition_efficiency")): _*)
    }),

    "m11_health_score" -> ((s, _) => Health.healthScore(metrics(s))),

    "m12_sub_scores" -> ((s, _) => Health.subScores(metrics(s))),

    "m13_alerts" -> ((s, _) => Health.alerts(metrics(s), A)),

    "m14_recommendations" -> ((s, _) =>
      Health.recommendations(Health.alerts(metrics(s), A), cat.tableMeta(s))),

    "m15_partition_resolve" -> ((s, _) =>
      MetaOps.partitionResolve(cat.partitionSpecs(s), cat.schemaVersions(s))),

    "m16_schema_evolution" -> ((s, _) =>
      MetaOps.schemaEvolution(cat.schemaVersions(s), "c_glue", "ml",
        "training_runs")),

    "m17_search_tables" -> ((s, _) =>
      MetaOps.searchTables(cat.listing(s), "orders")),

    "m18_tree_filter" -> ((s, _) =>
      MetaOps.treeFilterCountsMulti(cat.listing(s), treeQueries)),

    "m19_time_travel" -> ((s, _) =>
      MetaOps.timeTravel(cat.snapshots(s), cat.tableMeta(s), TravelMs)),

    "m20_config_sanitize" -> ((s, _) => {
      cat.appConfig(s)
        .select(col("name"), col("catalog_type"),
          explode(col("config")).as(Seq("key", "value")))
        .select(col("name"), col("catalog_type"), col("key"),
          Normalize.maskSecret(col("key"), col("value")).as("value"))
    }),

    // A16 honest-trend scale path: regr_slope moments are engine-internal
    // double folds, so no bit-exact oracle — driver records a rows-only
    // check (r2 verdict task 6); HealthSpec pins the classification.
    "m22_trends_exact" -> ((s, _) => Health.trendsExact(cat.snapshots(s))),

    // P6 companion — partition-transform EVALUATION (r2 verdict task 4):
    // every Iceberg transform applied to live rows, incl. the spec'd
    // 32-bit murmur3 bucket via the native iceberg_hash expression
    "m21_transform_eval" -> ((s, dir) => {
      val ev = graft.core.Tables.load(s, dir, "events")
      ev.select(col("event_id"),
        Transforms.bucket(col("user_id"), 16).as("uid_bucket16"),
        Transforms.bucket(col("event_id"), 32).as("eid_bucket32"),
        Transforms.truncString(col("event_type"), 3).as("etype_trunc3"),
        Transforms.truncLong(col("user_id"), 100).as("uid_trunc100"),
        Transforms.yearT(col("ts")).as("ts_year"),
        Transforms.monthT(col("ts")).as("ts_month"),
        Transforms.dayT(col("ts")).as("ts_day"),
        Transforms.hourT(col("ts")).as("ts_hour"),
        Transforms.voidT.as("ts_void"))
    }),

    // S1/S2 — REST catalog connect: listing + classification derived by
    // the load-probe semantics over parsed wire payloads
    "m23_rest_listing" -> ((s, _) => {
      restCat.listing(s)
        .withColumn("full_name",
          Normalize.fullName(col("namespace"), col("table_name")))
        .withColumn("is_iceberg", col("table_type") === "iceberg")
    }),

    // S6/S7 through the wire format: LoadTableResponse JSON → normalized
    // snapshot facts, identical to the parquet-fixture path
    "m24_rest_snapshots" -> ((s, _) => {
      restCat.snapshots(s).select(
        col("catalog"), col("namespace"), col("name"), col("snapshot_id"),
        col("ts"), col("op"), col("records_added"), col("size_change"),
        coalesce(col("added_files"), lit(0L)).as("added_files_n"),
        coalesce(col("total_size_bytes"), lit(0.0)).as("total_size_b"))
    }),

    // S2 — Glue catalog connect: listing + classification by the
    // Iceberg-on-Glue convention (table_type=ICEBERG pointer) composed
    // with the metadata-file load probe
    "m25_glue_listing" -> ((s, _) => {
      glueCat.listing(s)
        .withColumn("full_name",
          Normalize.fullName(col("namespace"), col("table_name")))
        .withColumn("is_iceberg", col("table_type") === "iceberg")
    }),

    // S1 multi-level namespaces (r18): the hierarchical-walk fixture —
    // depth-3 nesting enumerated via the ?parent= recursion, dotted
    // display names, and the 404-probe classification on a nested leaf
    "m27_rest_nested" -> ((s, _) => {
      new RestPayloadCatalog(RestNestedFixtureGen.DefaultDir).listing(s)
        .withColumn("full_name",
          Normalize.fullName(col("namespace"), col("table_name")))
        .withColumn("is_iceberg", col("table_type") === "iceberg")
    }),

    // S6/S7 through the Glue path: metadata files loaded from the
    // warehouse pointer → normalized snapshot facts, identical to the
    // parquet-fixture and REST paths for the glue-typed catalog
    "m26_glue_snapshots" -> ((s, _) => {
      glueCat.snapshots(s).select(
        col("catalog"), col("namespace"), col("name"), col("snapshot_id"),
        col("ts"), col("op"), col("records_added"), col("size_change"),
        coalesce(col("added_files"), lit(0L)).as("added_files_n"),
        coalesce(col("total_size_bytes"), lit(0.0)).as("total_size_b"))
    })
  )

  private def metrics(s: SparkSession): DataFrame =
    Health.tableMetrics(cat.snapshots(s), cat.tableMeta(s), A)

  // ------------------------------------------------------------------
  // DuckDB oracle: shared CTE mirroring Normalize + Health.tableMetrics.
  // ------------------------------------------------------------------

  private val compLike = "(op LIKE '%rewrite%' OR op LIKE '%compact%')"

  /** normalized snapshot CTE (mirror of [[Normalize.snapshots]]) */
  private val S_CTE =
    s"""s AS (
       SELECT catalog, namespace, name, snapshot_id, ts_ms, schema_id, summary,
         summary IS NOT NULL AS has_summary,
         CASE WHEN summary IS NULL THEN 'unknown' ELSE coalesce(
           summary['operation'][1],
           CASE WHEN len(summary['spark.app.id'])>0 THEN 'append' END,
           CASE WHEN len(summary['added-data-files'])>0 OR len(summary['added-records'])>0 THEN 'append' END,
           CASE WHEN len(summary['deleted-data-files'])>0 OR len(summary['deleted-records'])>0 THEN 'delete' END,
           CASE WHEN len(summary['total-data-files'])>0 THEN 'overwrite' END,
           'append') END AS op,
         CASE WHEN regexp_matches(summary['added-data-files'][1], '^[0-9]+$$') THEN CAST(summary['added-data-files'][1] AS BIGINT) END AS added_files,
         CASE WHEN regexp_matches(summary['added-records'][1], '^[0-9]+$$') THEN CAST(summary['added-records'][1] AS BIGINT) END AS added_records,
         TRY_CAST(summary['total-size'][1] AS DOUBLE) AS total_size_bytes,
         coalesce(len(summary['total-size'])>0, false) AS has_total_size
       FROM read_parquet('$F/snapshots.parquet/*.parquet'))"""

  /** per-table metric CTE chain (mirror of [[Health.tableMetrics]]) */
  private val METRICS_CTE =
    s"""$S_CTE,
       latest AS (
         SELECT catalog, namespace, name, added_files AS latest_files,
                total_size_bytes AS latest_size
         FROM s QUALIFY row_number() OVER (PARTITION BY catalog, namespace, name
                                           ORDER BY ts_ms DESC) = 1),
       agg AS (
         SELECT catalog, namespace, name,
           count(*) AS n_snapshots, min(ts_ms) AS min_ts, max(ts_ms) AS max_ts,
           CAST(sum(CASE WHEN ts_ms > $A - 3600000 THEN 1 ELSE 0 END) AS BIGINT) AS last_hour,
           CAST(sum(CASE WHEN ts_ms > $A - 86400000 THEN 1 ELSE 0 END) AS BIGINT) AS last_day,
           CAST(sum(CASE WHEN ts_ms > $A - 604800000 THEN 1 ELSE 0 END) AS BIGINT) AS last_week,
           CAST(sum(CASE WHEN $compLike THEN 1 ELSE 0 END) AS BIGINT) AS comp_n,
           min(CASE WHEN $compLike THEN ts_ms END) AS comp_first_ts,
           max(CASE WHEN $compLike THEN ts_ms END) AS comp_last_ts,
           CAST(sum(CASE WHEN has_total_size THEN 1 ELSE 0 END) AS BIGINT) AS n_size,
           min(CASE WHEN has_total_size THEN ts_ms END) AS first_size_ts,
           max(CASE WHEN has_total_size THEN ts_ms END) AS last_size_ts,
           arg_min(coalesce(total_size_bytes, 0)/1073741824.0,
                   CASE WHEN has_total_size THEN ts_ms END) AS first_size_gb,
           arg_max(coalesce(total_size_bytes, 0)/1073741824.0,
                   CASE WHEN has_total_size THEN ts_ms END) AS last_size_gb,
           CAST(sum(CASE WHEN has_summary THEN 1 ELSE 0 END) AS BIGINT) AS n_with_summary,
           CAST(sum(CASE WHEN has_summary AND lower(op) LIKE '%delete%' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
           CAST(sum(CASE WHEN has_summary AND lower(op) NOT LIKE '%delete%'
                     AND (lower(op) LIKE '%update%' OR lower(op) LIKE '%overwrite%')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_update
         FROM s GROUP BY 1, 2, 3),
       mm AS (
         SELECT t.catalog, t.namespace, t.name,
           coalesce(a.n_snapshots, 0) AS n_snapshots, a.min_ts, a.max_ts,
           coalesce(a.last_hour, 0) AS last_hour,
           coalesce(a.last_day, 0) AS last_day,
           coalesce(a.last_week, 0) AS last_week,
           coalesce(l.latest_files, 0) AS total_files,
           coalesce(l.latest_size, 0.0) AS total_size_bytes,
           coalesce(a.comp_n, 0) AS compactions, a.comp_first_ts, a.comp_last_ts,
           coalesce(a.n_size, 0) AS n_size, a.first_size_ts, a.last_size_ts,
           a.first_size_gb, a.last_size_gb,
           coalesce(a.n_with_summary, 0) AS n_with_summary,
           coalesce(a.n_delete, 0) AS n_delete,
           coalesce(a.n_update, 0) AS n_update
         FROM read_parquet('$F/table_meta.parquet/*.parquet') t
         LEFT JOIN agg a USING (catalog, namespace, name)
         LEFT JOIN latest l USING (catalog, namespace, name)),
       d1 AS (
         SELECT *,
           CASE WHEN total_files > 0
                THEN (total_size_bytes / total_files) / 1048576.0
                ELSE 0.0 END AS avg_file_size_mb
         FROM mm),
       d2 AS (
         SELECT *,
           CASE WHEN avg_file_size_mb < 16.0 THEN CAST(floor(total_files*0.7) AS BIGINT)
                WHEN avg_file_size_mb < 64.0 THEN CAST(floor(total_files*0.2) AS BIGINT)
                ELSE 0 END AS tiny_files,
           CASE WHEN avg_file_size_mb < 16.0 THEN CAST(floor(total_files*0.3) AS BIGINT)
                WHEN avg_file_size_mb < 64.0 THEN CAST(floor(total_files*0.6) AS BIGINT)
                ELSE 0 END AS small_files,
           CASE WHEN avg_file_size_mb < 16.0 THEN 0
                WHEN avg_file_size_mb < 64.0 THEN CAST(floor(total_files*0.2) AS BIGINT)
                WHEN avg_file_size_mb <= 512.0 THEN total_files
                ELSE CAST(floor(total_files*0.7) AS BIGINT) END AS optimal_files,
           CASE WHEN avg_file_size_mb > 512.0 THEN CAST(floor(total_files*0.3) AS BIGINT)
                ELSE 0 END AS large_files,
           CASE WHEN comp_last_ts IS NOT NULL
                THEN floor(($A - comp_last_ts)/3600000)/24.0 END AS days_since_compaction,
           CASE WHEN compactions > 1
                THEN floor((comp_last_ts - comp_first_ts)/86400000)/CAST(compactions - 1 AS DOUBLE)
                ELSE 0.0 END AS avg_compaction_frequency_days,
           CASE WHEN n_size > 1 AND floor((last_size_ts - first_size_ts)/86400000) > 0
                THEN (last_size_gb - first_size_gb)/floor((last_size_ts - first_size_ts)/86400000)
                ELSE 0.0 END AS storage_growth_rate_gb_per_day,
           CASE WHEN max_ts IS NOT NULL THEN floor(($A - max_ts)/3600000)
                ELSE 0.0 END AS data_freshness_hours,
           coalesce(last_size_gb, 0.0) AS total_size_gb,
           CASE WHEN n_with_summary > 0 THEN n_delete / n_with_summary ELSE 0.0 END AS delete_ratio,
           CASE WHEN n_with_summary > 0 THEN n_update / n_with_summary ELSE 0.0 END AS update_ratio,
           last_week / 168.0 AS avg_snapshots_per_hour,
           greatest(last_hour, last_day // 24) AS peak_snapshots_per_hour
         FROM d1),
       metrics AS (
         SELECT *, tiny_files + small_files AS small_files_count,
           CASE WHEN total_files > 0 THEN (tiny_files + small_files) / total_files
                ELSE 0.0 END AS small_file_ratio
         FROM d2)"""

  private val scorePenalties =
    """- CASE WHEN small_file_ratio > 0.5 THEN 30.0
            WHEN small_file_ratio > 0.3 THEN 15.0 ELSE 0.0 END
       - CASE WHEN last_hour > 20 THEN 20.0
              WHEN last_hour > 10 THEN 10.0 ELSE 0.0 END
       - CASE WHEN days_since_compaction IS NULL THEN 10.0
              WHEN days_since_compaction > 14.0 THEN 25.0
              WHEN days_since_compaction > 7.0 THEN 12.0 ELSE 0.0 END
       - CASE WHEN storage_growth_rate_gb_per_day > 500.0 THEN 15.0
              WHEN storage_growth_rate_gb_per_day > 100.0 THEN 8.0 ELSE 0.0 END"""

  private def treeSql(q: String): String =
    s"""SELECT '$q' AS query,
        (SELECT count(DISTINCT c.catalog_name)
         FROM read_parquet('$F/catalog_listing.parquet/*.parquet') c
         WHERE contains(lower(c.catalog_name), '$q')
            OR EXISTS (SELECT 1 FROM read_parquet('$F/catalog_listing.parquet/*.parquet') l
                       WHERE l.catalog_name = c.catalog_name
                         AND (contains(lower(l.namespace), '$q')
                           OR EXISTS (SELECT 1 FROM read_parquet('$F/catalog_listing.parquet/*.parquet') t
                                      WHERE t.catalog_name = l.catalog_name
                                        AND t.namespace = l.namespace
                                        AND contains(lower(t.table_name), '$q'))))) AS n_catalogs,
        (SELECT count(*) FROM (
           SELECT DISTINCT l.catalog_name, l.namespace
           FROM read_parquet('$F/catalog_listing.parquet/*.parquet') l
           WHERE contains(lower(l.namespace), '$q')
              OR EXISTS (SELECT 1 FROM read_parquet('$F/catalog_listing.parquet/*.parquet') t
                         WHERE t.catalog_name = l.catalog_name
                           AND t.namespace = l.namespace
                           AND contains(lower(t.table_name), '$q')))) AS n_namespaces,
        (SELECT count(*) FROM read_parquet('$F/catalog_listing.parquet/*.parquet')
         WHERE contains(lower(table_name), '$q')) AS n_tables"""

  /** shared by m01 (parquet fixtures) and m23 (REST wire format) — the
    * two client paths must serve the SAME catalog
    */
  private val ListingSql =
    s"""SELECT *, namespace || '.' || table_name AS full_name,
        table_type = 'iceberg' AS is_iceberg
        FROM read_parquet('$F/catalog_listing.parquet/*.parquet')"""

  /** shared by m02 and m24 for the same reason */
  private val SnapNormSql =
    s"""WITH $S_CTE
        SELECT catalog, namespace, name, snapshot_id, epoch_ms(ts_ms) AS ts,
          op, coalesce(summary['added-records'][1], '0') AS records_added,
          CASE WHEN len(summary['added-files-size'])>0 AND len(summary['removed-files-size'])>0
               THEN '+' || summary['added-files-size'][1] || ' -' || summary['removed-files-size'][1]
               WHEN len(summary['added-files-size'])>0
               THEN '+' || summary['added-files-size'][1]
               ELSE 'N/A' END AS size_change,
          coalesce(added_files, 0) AS added_files_n,
          coalesce(total_size_bytes, 0.0) AS total_size_b
        FROM s"""

  override val oracles: Map[String, String] = Map(
    "m01_list_tables" -> ListingSql,

    "m02_snapshot_normalize" -> SnapNormSql,

    "m23_rest_listing" -> ListingSql,
    "m27_rest_nested" ->
      s"""SELECT *, namespace || '.' || table_name AS full_name,
          table_type = 'iceberg' AS is_iceberg
          FROM read_parquet('$F/catalog_listing_nested.parquet/*.parquet')""",

    "m24_rest_snapshots" -> SnapNormSql,

    // the Glue client serves the glue-typed catalogs only; the oracle is
    // the parquet-fixture SQL filtered the same way
    "m25_glue_listing" ->
      s"""SELECT * FROM ($ListingSql) WHERE catalog_name = 'c_glue'""",

    "m26_glue_snapshots" ->
      s"""SELECT * FROM ($SnapNormSql) WHERE catalog = 'c_glue'""",

    "m03_snapshot_filters" -> {
      val lo = MetaOps.dayMs(filterParams.dateStart.get, endOfDay = false).get
      val hi = MetaOps.dayMs(filterParams.dateEnd.get, endOfDay = true).get
      s"""WITH $S_CTE
          SELECT catalog, namespace, name, snapshot_id, op, epoch_ms(ts_ms) AS ts
          FROM s
          WHERE op IN ('append', 'overwrite', 'delete')
            AND (added_files IS NULL OR added_files >= ${filterParams.filesAddedMin.get})
            AND (added_files IS NULL OR added_files <= ${filterParams.filesAddedMax.get})
            AND (added_records IS NULL OR added_records >= ${filterParams.recordsAddedMin.get})
            AND (added_records IS NULL OR added_records <= ${filterParams.recordsAddedMax.get})
            AND ts_ms >= $lo AND ts_ms <= $hi"""
    },

    "m04_op_distribution" ->
      s"""WITH $S_CTE
          SELECT catalog, namespace, name, op, count(*) AS n
          FROM s GROUP BY 1, 2, 3, 4""",

    "m05_windowed_activity" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name, last_hour, last_day, last_week,
            avg_snapshots_per_hour, peak_snapshots_per_hour FROM metrics""",

    "m06_time_span" ->
      s"""WITH $S_CTE
          SELECT catalog, namespace, name, count(*) AS n,
            epoch_ms(min(ts_ms)) AS first_ts, epoch_ms(max(ts_ms)) AS last_ts,
            CAST(floor((max(ts_ms) - min(ts_ms)) / 86400000) AS BIGINT) AS span_days
          FROM s GROUP BY 1, 2, 3""",

    "m07_latest_state" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name, total_files, total_size_bytes,
            avg_file_size_mb FROM metrics""",

    "m08_file_distribution" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name, tiny_files, small_files,
            optimal_files, large_files, small_files_count, small_file_ratio
          FROM metrics""",

    "m09_compaction" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name, compactions, days_since_compaction,
            avg_compaction_frequency_days,
            0.8 AS compaction_effectiveness FROM metrics""",

    "m10_storage" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name, total_size_gb,
            storage_growth_rate_gb_per_day, delete_ratio, update_ratio,
            data_freshness_hours, 0.85 AS partition_efficiency FROM metrics""",

    "m11_health_score" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name,
            greatest(0.0, least(100.0, 100.0 $scorePenalties)) AS health_score,
            'stable' AS file_count_trend, 'improving' AS avg_file_size_trend,
            'stable' AS snapshot_frequency_trend,
            'degrading' AS storage_growth_trend
          FROM metrics""",

    "m12_sub_scores" ->
      s"""WITH $METRICS_CTE, scored AS (
            SELECT catalog, namespace, name,
              greatest(0.0, 100.0
                - CASE WHEN small_file_ratio > 0.5 THEN 30.0
                       WHEN small_file_ratio > 0.3 THEN 15.0 ELSE 0.0 END
                - CASE WHEN avg_file_size_mb < 16.0 THEN 10.0 ELSE 0.0 END) AS file_score,
              greatest(0.0, 100.0
                - CASE WHEN last_hour > 20 THEN 20.0
                       WHEN last_hour > 10 THEN 10.0 ELSE 0.0 END) AS operational_score,
              greatest(0.0, 100.0
                - CASE WHEN storage_growth_rate_gb_per_day > 500.0 THEN 15.0
                       WHEN storage_growth_rate_gb_per_day > 100.0 THEN 8.0 ELSE 0.0 END
                - CASE WHEN data_freshness_hours > 48.0 THEN 10.0
                       WHEN data_freshness_hours > 24.0 THEN 5.0 ELSE 0.0 END) AS storage_score,
              greatest(0.0, 100.0
                - CASE WHEN days_since_compaction IS NULL THEN 10.0
                       WHEN days_since_compaction > 14.0 THEN 25.0
                       WHEN days_since_compaction > 7.0 THEN 12.0 ELSE 0.0 END) AS compaction_score
            FROM metrics)
          SELECT catalog, namespace, name,
            file_score,
            CASE WHEN file_score >= 90.0 THEN 'Good' WHEN file_score >= 70.0 THEN 'Warning' ELSE 'Critical' END AS file_status,
            operational_score,
            CASE WHEN operational_score >= 90.0 THEN 'Good' WHEN operational_score >= 70.0 THEN 'Warning' ELSE 'Critical' END AS operational_status,
            storage_score,
            CASE WHEN storage_score >= 90.0 THEN 'Good' WHEN storage_score >= 70.0 THEN 'Warning' ELSE 'Critical' END AS storage_status,
            compaction_score,
            CASE WHEN compaction_score >= 90.0 THEN 'Good' WHEN compaction_score >= 70.0 THEN 'Warning' ELSE 'Critical' END AS compaction_status
          FROM scored""",

    "m13_alerts" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name, 'small_files' AS category,
            CASE WHEN small_file_ratio > 0.5 THEN 'critical' ELSE 'warning' END AS severity,
            small_file_ratio AS metric_value,
            CASE WHEN small_file_ratio > 0.5 THEN 0.5 ELSE 0.3 END AS threshold,
            (CASE WHEN small_file_ratio > 0.5 THEN 'Critical' ELSE 'High' END)
              || ' small file ratio: ' || printf('%.1f', small_file_ratio * 100)
              || '% of files are smaller than 64MB' AS message,
            epoch_ms($A) AS detected_at
          FROM metrics WHERE small_file_ratio > 0.3
          UNION ALL
          SELECT catalog, namespace, name, 'high_snapshot_frequency',
            'critical', CAST(last_hour AS DOUBLE), 20.0,
            'Extremely high snapshot frequency: ' || CAST(last_hour AS VARCHAR)
              || ' snapshots in the last hour',
            epoch_ms($A)
          FROM metrics WHERE last_hour > 20
          UNION ALL
          SELECT catalog, namespace, name, 'compaction_needed', 'critical',
            days_since_compaction, 14.0,
            'Table needs compaction: ' || printf('%.1f', days_since_compaction)
              || ' days since last compaction',
            epoch_ms($A)
          FROM metrics WHERE days_since_compaction > 14.0
          UNION ALL
          SELECT catalog, namespace, name, 'storage_growth', 'warning',
            storage_growth_rate_gb_per_day, 500.0,
            'High storage growth rate: ' || printf('%.1f', storage_growth_rate_gb_per_day)
              || ' GB per day',
            epoch_ms($A)
          FROM metrics WHERE storage_growth_rate_gb_per_day > 500.0""",

    "m14_recommendations" ->
      s"""WITH $METRICS_CTE
          SELECT catalog, namespace, name,
            CASE WHEN small_file_ratio > 0.5 THEN 'high' ELSE 'medium' END AS priority,
            'compaction' AS action_type,
            'Run table compaction to merge small files into larger, more efficient files' AS description,
            'Improved query performance and reduced metadata overhead' AS estimated_benefit,
            'medium' AS effort_level
          FROM metrics WHERE small_file_ratio > 0.3
          UNION ALL
          SELECT catalog, namespace, name, 'high', 'compaction',
            'Schedule regular compaction job for this table',
            'Better file organisation and query performance', 'medium'
          FROM metrics WHERE days_since_compaction > 14.0
          UNION ALL
          SELECT catalog, namespace, name, 'medium', 'optimization',
            'Review write patterns and consider batching smaller writes',
            'Reduced metadata overhead and improved table performance', 'low'
          FROM metrics WHERE last_hour > 20
          UNION ALL
          SELECT catalog, namespace, name, 'low', 'retention_policy',
            'Consider implementing data retention policies to manage storage growth',
            'Controlled storage costs and improved performance', 'high'
          FROM read_parquet('$F/table_meta.parquet/*.parquet')""",

    "m15_partition_resolve" ->
      s"""WITH pf AS (
            SELECT catalog, namespace, name, spec_id, is_default,
              unnest(fields) AS f
            FROM read_parquet('$F/partition_specs.parquet/*.parquet')),
          cf AS (
            SELECT catalog, namespace, name, unnest(fields) AS f
            FROM read_parquet('$F/schema_versions.parquet/*.parquet')
            WHERE is_current)
          SELECT p.catalog, p.namespace, p.name, p.spec_id, p.is_default,
            p.f.source_id AS source_id, p.f.field_id AS field_id,
            p.f.name AS part_name, p.f.transform AS transform,
            coalesce(c.f.name, 'Field ' || p.f.source_id) AS source_field
          FROM pf p LEFT JOIN cf c
            ON p.catalog = c.catalog AND p.namespace = c.namespace
           AND p.name = c.name AND p.f.source_id = c.f.id""",

    "m16_schema_evolution" ->
      s"""WITH f AS (
            SELECT schema_id, unnest(fields) AS fl
            FROM read_parquet('$F/schema_versions.parquet/*.parquet')
            WHERE catalog = 'c_glue' AND namespace = 'ml' AND name = 'training_runs')
          SELECT fl.id AS field_id, arg_min(fl.name, schema_id) AS field_name,
            min(CASE WHEN schema_id = 1 THEN fl.ftype || CASE WHEN fl.required THEN ' REQ' ELSE '' END END) AS s1,
            min(CASE WHEN schema_id = 2 THEN fl.ftype || CASE WHEN fl.required THEN ' REQ' ELSE '' END END) AS s2,
            min(CASE WHEN schema_id = 3 THEN fl.ftype || CASE WHEN fl.required THEN ' REQ' ELSE '' END END) AS s3
          FROM f GROUP BY fl.id""",

    "m17_search_tables" ->
      s"""SELECT *, namespace || '.' || table_name AS full_name
          FROM read_parquet('$F/catalog_listing.parquet/*.parquet')
          WHERE contains(lower(namespace || '.' || table_name), 'orders')
             OR contains(lower(table_name), 'orders')
             OR contains(lower(namespace), 'orders')
          ORDER BY full_name LIMIT 10""",

    "m18_tree_filter" -> treeQueries.map(treeSql).mkString("\nUNION ALL\n"),

    "m19_time_travel" ->
      s"""WITH $S_CTE,
          picked AS (
            SELECT * FROM s WHERE ts_ms <= $TravelMs
            QUALIFY row_number() OVER (PARTITION BY catalog, namespace, name
                                       ORDER BY ts_ms DESC) = 1)
          SELECT p.catalog, p.namespace, p.name, p.snapshot_id,
            epoch_ms(p.ts_ms) AS ts, p.op,
            p.snapshot_id = t.current_snapshot_id AS is_current
          FROM picked p
          JOIN read_parquet('$F/table_meta.parquet/*.parquet') t
            USING (catalog, namespace, name)""",

    "m20_config_sanitize" ->
      s"""SELECT name, catalog_type, e.key AS key,
            CASE WHEN e.key IN ('auth_token', 'credential') AND e.value != ''
                 THEN '***HIDDEN***' ELSE e.value END AS value
          FROM (SELECT name, catalog_type, unnest(map_entries(config)) AS e
                FROM read_parquet('$F/app_config.parquet/*.parquet'))""",

    "m21_transform_eval" -> m21Sql
  )

  // ------------------------------------------------------------------
  // m21 oracle: Iceberg 32-bit murmur3 unrolled as 32-bit-masked UBIGINT
  // arithmetic (an INDEPENDENT implementation of the spec'd hash — the
  // Spark side runs the native IcebergHash expression). Validated against
  // the Iceberg spec vector hash(34) = 2017239379.
  // ------------------------------------------------------------------

  /** one murmur3_x86_32(le_bytes(long), seed 0) step chain under name
    * prefix `p`; inputs `p_k1`/`p_k2` are the low/high 32-bit words
    */
  private def murmurSteps(p: String): Seq[(String, String)] = {
    val M = "4294967295"
    // (x * c) mod 2^32 without UBIGINT overflow: split x into 16-bit halves
    def mul32(x: String, c: Long) =
      s"((($x & 65535) * $c + (((($x >> 16) * $c) & 65535) << 16)) & $M)"
    def rotl(x: String, r: Int) =
      s"((($x << $r) | ($x >> ${32 - r})) & $M)"
    Seq(
      s"${p}_t1" -> mul32(s"${p}_k1", 3432918353L), // k1 * c1
      s"${p}_t2" -> rotl(s"${p}_t1", 15),
      s"${p}_t3" -> mul32(s"${p}_t2", 461845907L), // k1 * c2; h = 0 ^ k1
      s"${p}_h2" -> rotl(s"${p}_t3", 13),
      s"${p}_h3" -> s"((${p}_h2 * 5 + 3864292196) & $M)",
      s"${p}_u1" -> mul32(s"${p}_k2", 3432918353L), // second block
      s"${p}_u2" -> rotl(s"${p}_u1", 15),
      s"${p}_u3" -> mul32(s"${p}_u2", 461845907L),
      s"${p}_h4" -> s"xor(${p}_h3, ${p}_u3)",
      s"${p}_h5" -> rotl(s"${p}_h4", 13),
      s"${p}_h6" -> s"((${p}_h5 * 5 + 3864292196) & $M)",
      s"${p}_f1" -> s"xor(${p}_h6, 8)", // finalize: h ^= len(8 bytes)
      s"${p}_f2" -> s"xor(${p}_f1, ${p}_f1 >> 16)",
      s"${p}_f3" -> mul32(s"${p}_f2", 2246822507L),
      s"${p}_f4" -> s"xor(${p}_f3, ${p}_f3 >> 13)",
      s"${p}_f5" -> mul32(s"${p}_f4", 3266489909L),
      s"${p}_f6" -> s"xor(${p}_f5, ${p}_f5 >> 16)")
  }

  private def m21Sql: String = {
    val a = murmurSteps("a") // user_id chain
    val b = murmurSteps("b") // event_id chain
    val layers = a.zip(b).zipWithIndex.map { case (((an, ae), (bn, be)), i) =>
      s"s${i + 1} AS (SELECT *, $ae AS $an, $be AS $bn FROM s$i)"
    }
    val last = s"s${a.size}"
    s"""WITH s0 AS (
          SELECT event_id, user_id, event_type, ts,
            CAST(user_id AS UBIGINT) & 4294967295 AS a_k1,
            (CAST(user_id AS UBIGINT) >> 32) & 4294967295 AS a_k2,
            CAST(event_id AS UBIGINT) & 4294967295 AS b_k1,
            (CAST(event_id AS UBIGINT) >> 32) & 4294967295 AS b_k2
          FROM events),
        ${layers.mkString(",\n        ")}
        SELECT event_id,
          CAST((a_f6 & 2147483647) % 16 AS INT) AS uid_bucket16,
          CAST((b_f6 & 2147483647) % 32 AS INT) AS eid_bucket32,
          substr(event_type, 1, 3) AS etype_trunc3,
          user_id - ((user_id % 100 + 100) % 100) AS uid_trunc100,
          CAST(year(ts) - 1970 AS INT) AS ts_year,
          CAST((year(ts) - 1970) * 12 + (month(ts) - 1) AS INT) AS ts_month,
          CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS ts_day,
          date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', ts) AS ts_hour,
          CAST(NULL AS INT) AS ts_void
        FROM $last"""
  }
}
