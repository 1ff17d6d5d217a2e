package graft.meta

import org.apache.spark.sql.SparkSession

import Model._

/** Writes the golden Iceberg-metadata fixtures (FIXTURES.md §1) as parquet
  * under `fixtures/meta/` — deterministic, no wall-clock, every timestamp
  * derived from the pinned [[Model.AsOfMs]].
  *
  * The table population is designed so that every branch of the reference's
  * analytics fires somewhere (citations per table below):
  *
  *   - `c_rest.sales.orders_hot`  — 25 snapshots in the asOf-hour (critical
  *     snapshot-frequency, `analytics.rs:306-314`), latest avg file size
  *     8 MB (tiny-file branch + critical small-file ratio,
  *     `analytics.rs:92-94,299-303`), compactions 20d and 2d ago.
  *   - `c_rest.sales.orders_cold` — last compaction 20 days ago (critical,
  *     `analytics.rs:317-323`), stale freshness (>48 h sub-score penalty,
  *     `components.rs:1917-1921`), optimal file sizes.
  *   - `c_rest.ads.clicks`       — every operation-inference branch of
  *     `iceberg_adapter.rs:169-187` (explicit op / spark.app.id / added-* /
  *     deleted-* / total-data-files / empty map / null summary) plus
  *     unparseable numerics for the F2/F3 pass-through semantics
  *     (`components.rs:710-752`); never compacted (None-penalty path,
  *     `analytics.rs:324-327`).
  *   - `c_glue.ml.features`      — storage growth ≈ 792 GB/day (critical
  *     alert with Warning severity, `analytics.rs:423-437`), large-file
  *     split branch, delete/update ratio mix (`analytics.rs:224-231`).
  *   - `c_glue.ml.training_runs` — 3 schema versions sharing field-ids for
  *     the evolution pivot (`components.rs:533-605`).
  *   - `c_glue.tmp.scratch`      — zero snapshots (empty-history guards).
  */
object FixtureGen {

  private val MIN = 60000L
  private val H = 3600000L
  private val D = 86400000L
  private val A = AsOfMs

  private def snap(
      cat: String, ns: String, tbl: String, id: Long, ts: Long,
      sum: Option[Map[String, String]], schemaId: Int = 1): SnapshotFx =
    SnapshotFx(cat, ns, tbl, id, ts, s"s3://warehouse/$ns/$tbl/meta/snap-$id.avro",
      Some(schemaId), sum)

  def snapshots: Seq[SnapshotFx] = {
    // ---- orders_hot: 40 snapshots, oldest→newest -----------------------
    val hotTs: Seq[Long] =
      Seq(A - 30 * D, A - 25 * D, A - 20 * D, A - 15 * D, A - 10 * D) ++
        Seq(A - 6 * D, A - 5 * D, A - 4 * D, A - 3 * D, A - 2 * D) ++
        Seq(A - 20 * H, A - 18 * H, A - 15 * H, A - 10 * H, A - 5 * H) ++
        (0 until 25).map(i => A - 55 * MIN + i * 2 * MIN)
    val hot = hotTs.zipWithIndex.map { case (ts, i) =>
      val op = if (i == 2 || i == 9) "rewrite-data-files" else "append"
      val last = i == hotTs.size - 1
      val size = if (last) 1677721600L else 53687091200L + i * 1073741824L
      snap("c_rest", "sales", "orders_hot", 1000L + i, ts, Some(Map(
        "operation" -> op,
        "added-data-files" -> (if (last) "200" else "120"),
        "added-records" -> "5000",
        "added-files-size" -> "1048576000",
        "total-records" -> (100000L + i * 5000L).toString,
        "total-size" -> size.toString)))
    }

    // ---- orders_cold: 10 snapshots, all ≥ 8 days old -------------------
    val coldTs = Seq(60, 55, 50, 45, 40, 35, 30, 25, 20, 8).map(d => A - d * D)
    val cold = coldTs.zipWithIndex.map { case (ts, i) =>
      val op = if (i == 8) "rewrite-data-files" else "append"
      val last = i == coldTs.size - 1
      val size = if (last) 2684354560L else 107374182400L + i * 1073741824L
      snap("c_rest", "sales", "orders_cold", 2000L + i, ts, Some(Map(
        "operation" -> op,
        "added-data-files" -> "10",
        "added-records" -> "800",
        "total-size" -> size.toString)))
    }

    // ---- clicks: inference + pass-through variants ---------------------
    val clicks = Seq(
      snap("c_rest", "ads", "clicks", 3000L, A - 10 * D, Some(Map(
        "operation" -> "append", "added-data-files" -> "50",
        "added-records" -> "1000", "total-size" -> "10737418240"))),
      snap("c_rest", "ads", "clicks", 3001L, A - 9 * D, Some(Map(
        "spark.app.id" -> "app-123", "total-size" -> "11000000000"))),
      snap("c_rest", "ads", "clicks", 3002L, A - 8 * D, Some(Map(
        "added-records" -> "2000"))),
      snap("c_rest", "ads", "clicks", 3003L, A - 7 * D, Some(Map(
        "deleted-records" -> "500"))),
      snap("c_rest", "ads", "clicks", 3004L, A - 6 * D, Some(Map(
        "total-data-files" -> "40"))),
      snap("c_rest", "ads", "clicks", 3005L, A - 5 * D, Some(Map.empty)),
      snap("c_rest", "ads", "clicks", 3006L, A - 4 * D, None),
      snap("c_rest", "ads", "clicks", 3007L, A - 3 * D, Some(Map(
        "operation" -> "append", "added-data-files" -> "N/A",
        "total-size" -> "11500000000"))),
      snap("c_rest", "ads", "clicks", 3008L, A - 1 * D, Some(Map(
        "operation" -> "overwrite", "added-records" -> "abc",
        "total-size" -> "12000000000"))),
      snap("c_rest", "ads", "clicks", 3009L, A - 2 * H, Some(Map(
        "operation" -> "append", "added-data-files" -> ""))))

    // ---- features: growth-critical, large files, op mix ----------------
    val featSpec = Seq(
      (4 * D, "append", "1000", 1099511627776L),
      (3 * D + 12 * H, "overwrite", "1100", 1374389534720L),
      (3 * D, "append", "1200", 1649267441664L),
      (2 * D + 12 * H, "delete", "1200", 1580547964928L),
      (2 * D, "append", "1400", 1924145348608L),
      (1 * D + 12 * H, "overwrite", "1500", 2199023255552L),
      (25 * H, "rewrite-data-files", "1500", 2198000000000L),
      (18 * H, "delete", "1450", 2100000000000L),
      (12 * H, "overwrite", "1600", 2400000000000L),
      (6 * H, "append", "1800", 2800000000000L),
      (2 * H, "append", "2000", 3200000000000L),
      (30 * MIN, "append", "5803", 3650931916800L))
    val features = featSpec.zipWithIndex.map { case ((ago, op, adf, size), i) =>
      snap("c_glue", "ml", "features", 4000L + i, A - ago, Some(Map(
        "operation" -> op, "added-data-files" -> adf,
        "added-records" -> "100000", "total-size" -> size.toString)))
    }

    // ---- training_runs: 3 appends ------------------------------------
    val training = Seq(
      (3 * D, 536870912L, 1), (2 * D, 603979776L, 2), (1 * D, 671088640L, 3))
      .zipWithIndex.map { case ((ago, size, schemaId), i) =>
        snap("c_glue", "ml", "training_runs", 5000L + i, A - ago, Some(Map(
          "operation" -> "append", "added-data-files" -> "5",
          "added-records" -> "250", "total-size" -> size.toString)), schemaId)
      }

    hot ++ cold ++ clicks ++ features ++ training
  }

  def schemas: Seq[SchemaFx] = Seq(
    SchemaFx("c_rest", "sales", "orders_hot", 1, is_current = true, Seq(
      FieldFx(1, "id", required = true, None, "long"),
      FieldFx(2, "o_date", required = false, Some("order date"), "date"),
      FieldFx(3, "price", required = false, None, "decimal(10, 2)"))),
    SchemaFx("c_rest", "sales", "orders_cold", 1, is_current = true, Seq(
      FieldFx(1, "id", required = true, None, "long"),
      FieldFx(2, "o_date", required = false, None, "date"))),
    SchemaFx("c_rest", "ads", "clicks", 1, is_current = true, Seq(
      FieldFx(1, "event_id", required = true, None, "long"),
      FieldFx(2, "payload", required = false, None, "struct"))),
    SchemaFx("c_glue", "ml", "features", 1, is_current = true, Seq(
      FieldFx(6, "vec", required = false, None, "list<float>"),
      FieldFx(7, "label", required = false, None, "int"))),
    // evolution series: field 2 dropped in v3, field 3 retyped in v2,
    // fields 4/5 added along the way (J2 pivot input)
    SchemaFx("c_glue", "ml", "training_runs", 1, is_current = false, Seq(
      FieldFx(1, "id", required = true, None, "long"),
      FieldFx(2, "name", required = false, Some("run name"), "string"),
      FieldFx(3, "price", required = false, None, "decimal(10, 2)"))),
    SchemaFx("c_glue", "ml", "training_runs", 2, is_current = false, Seq(
      FieldFx(1, "id", required = true, None, "long"),
      FieldFx(2, "name", required = false, None, "string"),
      FieldFx(3, "price", required = false, None, "double"),
      FieldFx(4, "tags", required = false, None, "list<string>"))),
    SchemaFx("c_glue", "ml", "training_runs", 3, is_current = true, Seq(
      FieldFx(1, "id", required = true, None, "long"),
      FieldFx(3, "price", required = false, None, "double"),
      FieldFx(4, "tags", required = false, None, "list<string>"),
      FieldFx(5, "meta", required = false, None, "struct"))),
    SchemaFx("c_glue", "tmp", "scratch", 1, is_current = true, Seq(
      FieldFx(1, "x", required = false, None, "int"))))

  def specs: Seq[SpecFx] = Seq(
    SpecFx("c_rest", "sales", "orders_hot", 0, is_default = false, Seq(
      PartFieldFx(2, 1000, "o_date_ident", "identity"),
      PartFieldFx(1, 1001, "id_bucket", "bucket[16]"))),
    SpecFx("c_rest", "sales", "orders_hot", 1, is_default = true, Seq(
      PartFieldFx(2, 1002, "o_date_day", "day"),
      PartFieldFx(3, 1003, "price_trunc", "truncate[4]"))),
    // source_id 99 has no schema field — J1 fallback "Field 99"
    // (components.rs:1592-1598)
    SpecFx("c_glue", "ml", "features", 0, is_default = true, Seq(
      PartFieldFx(99, 1000, "mystery", "void"),
      PartFieldFx(7, 1001, "label_ident", "identity"))))

  def listing: Seq[ListingFx] = Seq(
    ListingFx("c_rest", "rest", "sales", "orders_hot", "iceberg"),
    ListingFx("c_rest", "rest", "sales", "orders_cold", "iceberg"),
    ListingFx("c_rest", "rest", "sales", "legacy_csv", "unknown"),
    ListingFx("c_rest", "rest", "ads", "clicks", "iceberg"),
    ListingFx("c_glue", "glue", "ml", "features", "iceberg"),
    ListingFx("c_glue", "glue", "ml", "training_runs", "iceberg"),
    ListingFx("c_glue", "glue", "tmp", "scratch", "iceberg"),
    ListingFx("c_glue", "glue", "tmp", "export_job", "unknown"))

  def tableMeta: Seq[TableMetaFx] = Seq(
    TableMetaFx("c_rest", "sales", "orders_hot",
      "s3://warehouse/sales/orders_hot", Some(1039L), 1,
      Map("write.format.default" -> "parquet", "owner" -> "sales-eng")),
    TableMetaFx("c_rest", "sales", "orders_cold",
      "s3://warehouse/sales/orders_cold", Some(2009L), 1,
      Map("write.format.default" -> "parquet")),
    TableMetaFx("c_rest", "ads", "clicks",
      "s3://warehouse/ads/clicks", Some(3009L), 1,
      Map("write.format.default" -> "orc", "commit.retry.num-retries" -> "4")),
    TableMetaFx("c_glue", "ml", "features",
      "s3://warehouse/ml/features", Some(4011L), 1,
      Map("write.format.default" -> "parquet")),
    TableMetaFx("c_glue", "ml", "training_runs",
      "s3://warehouse/ml/training_runs", Some(5002L), 3,
      Map("write.format.default" -> "parquet", "format-version" -> "2")),
    TableMetaFx("c_glue", "tmp", "scratch",
      "s3://warehouse/tmp/scratch", None, 1, Map.empty))

  def appConfig: Seq[ConfigFx] = Seq(
    ConfigFx("c_rest", "rest", Map(
      "uri" -> "http://localhost:8181",
      "warehouse" -> "s3://warehouse",
      "auth_token" -> "sekrit-token-123")),
    ConfigFx("c_glue", "glue", Map(
      "warehouse" -> "s3://warehouse",
      "region" -> "us-east-1",
      "profile" -> "prod")))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/fixtures/meta")
    val spark = graft.core.GraftSession.builder("graft-fixtures", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def write[T <: Product : org.apache.spark.sql.Encoder](
        name: String, rows: Seq[T]): Unit =
      rows.toDS().coalesce(1).write.mode("overwrite").parquet(s"$out/$name.parquet")
    write("snapshots", snapshots)
    write("schema_versions", schemas)
    write("partition_specs", specs)
    write("catalog_listing", listing)
    write("table_meta", tableMeta)
    write("app_config", appConfig)
    spark.stop()
  }
}
