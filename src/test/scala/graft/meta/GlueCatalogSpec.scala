package graft.meta

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import Model.ConfigFx

/** The Glue wire-format client path (S2 minus the SigV4 transport) must
  * reproduce the parquet-fixture catalog EXACTLY for the glue-typed
  * subset: same listing (classification via the Iceberg-on-Glue
  * `table_type=ICEBERG` convention composed with the metadata-file load
  * probe), same normalized snapshots, schema/spec versions, and head
  * objects — so an AWS-SDK transport slots in behind
  * [[GlueClientCatalog]] changing nothing downstream.
  */
class GlueCatalogSpec extends SparkSpec {

  private lazy val glue = GluePayloadCatalog.default
  private lazy val fix = FixtureCatalog.default
  private def glueOnly(df: DataFrame, col: String): DataFrame =
    df.filter(org.apache.spark.sql.functions.col(col) === "c_glue")

  private def canon(v: Any): String = v match {
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => s"$k->$x" }.sorted.mkString("{", ",", "}")
    case other => String.valueOf(other)
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map { r =>
      r.schema.fieldNames.sorted.map(n => s"$n=${canon(r.getAs[Any](n))}")
        .mkString("|")
    }.toSet

  test("listing matches; convention+probe classification is derived") {
    assert(rows(glue.listing(spark)) ==
      rows(glueOnly(fix.listing(spark), "catalog_name")))
    // export_job renders as a plain csv EXTERNAL_TABLE with no Iceberg
    // pointer — "unknown" comes from the convention, not a copied column
    val unknown = glue.listing(spark)
      .filter(org.apache.spark.sql.functions.col("table_type") === "unknown")
      .collect().map(_.getAs[String]("table_name")).toSet
    assert(unknown == Set("export_job"))
  }

  test("normalized snapshots identical through the Glue metadata files") {
    assert(rows(glue.snapshots(spark)) ==
      rows(glueOnly(fix.snapshots(spark), "catalog")))
  }

  test("schema versions, specs, heads round-trip; registry full") {
    assert(rows(glue.schemaVersions(spark)) ==
      rows(glueOnly(fix.schemaVersions(spark), "catalog")))
    assert(rows(glue.partitionSpecs(spark)) ==
      rows(glueOnly(fix.partitionSpecs(spark), "catalog")))
    assert(rows(glue.tableMeta(spark)) ==
      rows(glueOnly(fix.tableMeta(spark), "catalog")))
    // appConfig is the whole registry (the reference keeps one config
    // store); only the glue-typed entries contribute catalog data
    assert(rows(glue.appConfig(spark)) == rows(fix.appConfig(spark)))
  }

  test("Glue wire shapes round-trip render→parse") {
    val dbs = Seq("ml", "tmp")
    assert(GlueWire.parseDatabases(GlueWire.getDatabasesJson(dbs)) == dbs)
    val entries = Seq(
      GlueWire.GlueTableFx("ml", "features", "EXTERNAL_TABLE",
        Map("table_type" -> "ICEBERG",
          "metadata_location" -> "s3://wh/ml/features/metadata/v1.json")),
      GlueWire.GlueTableFx("ml", "raw_logs", "EXTERNAL_TABLE",
        Map("classification" -> "csv")))
    assert(GlueWire.parseTables(GlueWire.getTablesJson(entries)) == entries)
  }

  test("iceberg pointer detection is case-insensitive; csv is not one") {
    val up = GlueWire.GlueTableFx("d", "t", "EXTERNAL_TABLE",
      Map("table_type" -> "ICEBERG", "metadata_location" -> "s3://x"))
    val low = up.copy(parameters =
      Map("table_type" -> "iceberg", "metadata_location" -> "s3://x"))
    val csv = up.copy(parameters = Map("classification" -> "csv"))
    assert(up.isIcebergPointer && low.isIcebergPointer)
    assert(!csv.isIcebergPointer)
    assert(csv.metadataLocation.isEmpty)
  }

  test("a dangling metadata_location pointer classifies unknown") {
    // same payloads, but a metadataDoc that never finds the file: the
    // probe (not the pointer alone) decides the classification
    val broken = new GluePayloadCatalog(GluePayloadCatalog.DefaultDir) {
      override protected def metadataDoc(cfg: ConfigFx,
          location: String): Option[String] = None
    }
    val types = broken.listing(spark).collect()
      .map(_.getAs[String]("table_type")).toSet
    assert(types == Set("unknown"))
  }

  test("effectiveProps: warehouse required, region defaulted us-east-1") {
    val full = ConfigFx("g", "glue", Map("warehouse" -> "s3://wh",
      "region" -> "eu-west-1", "profile" -> "prod",
      "endpoint_url" -> "http://localhost:9000"))
    assert(GlueWire.effectiveProps(full) == Map("warehouse" -> "s3://wh",
      "region" -> "eu-west-1", "profile" -> "prod",
      "endpoint_url" -> "http://localhost:9000"))
    val minimal = ConfigFx("g", "glue", Map("warehouse" -> "s3://wh"))
    assert(GlueWire.effectiveProps(minimal) ==
      Map("warehouse" -> "s3://wh", "region" -> "us-east-1"))
    intercept[IllegalArgumentException] {
      GlueWire.effectiveProps(ConfigFx("g", "glue", Map.empty))
    }
  }

  test("standalone TableMetadata file is a render→parse fixed point") {
    val key = ("c_glue", "ml", "training_runs")
    val m = FixtureGen.tableMeta.find(t =>
      (t.catalog, t.namespace, t.name) == key).get
    val json = RestWire.tableMetadataJson(m,
      FixtureGen.schemas.filter(s => (s.catalog, s.namespace, s.name) == key),
      FixtureGen.specs.filter(s => (s.catalog, s.namespace, s.name) == key),
      FixtureGen.snapshots.filter(s => (s.catalog, s.namespace, s.name) == key))
    val (m2, sch2, sp2, sn2) =
      RestWire.parseTableMetadata("c_glue", "ml", "training_runs", json)
    assert(m2 == m)
    assert(sch2.toSet == FixtureGen.schemas
      .filter(s => (s.catalog, s.namespace, s.name) == key).toSet)
    assert(sp2.toSet == FixtureGen.specs
      .filter(s => (s.catalog, s.namespace, s.name) == key).toSet)
    assert(sn2.toSet == FixtureGen.snapshots
      .filter(s => (s.catalog, s.namespace, s.name) == key).toSet)
  }
}
