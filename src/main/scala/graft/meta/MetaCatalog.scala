package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog seam (S1-S6). The reference reaches live REST/Glue catalogs
  * through the `iceberg` crate (`/root/reference/src/catalog.rs:154-246`);
  * this build is offline with no Iceberg runtime jar (SURVEY §0), so the
  * interface is pluggable and the shipped implementation reads the golden
  * metadata fixtures. A runtime-backed implementation slots in behind the
  * same trait without touching any operator.
  */
trait MetaCatalog {
  /** S4/S5 — one row per (catalog, namespace, table) with classification */
  def listing(spark: SparkSession): DataFrame
  /** S6 head object per table */
  def tableMeta(spark: SparkSession): DataFrame
  /** the snapshot fact table, normalized (S7) */
  def snapshots(spark: SparkSession): DataFrame
  def schemaVersions(spark: SparkSession): DataFrame
  def partitionSpecs(spark: SparkSession): DataFrame
  /** S8 — app config (connection registry contents) */
  def appConfig(spark: SparkSession): DataFrame
}

/** Fixture-backed catalog over the parquet written by [[FixtureGen]]. */
class FixtureCatalog(dir: String) extends MetaCatalog {
  private def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  override def listing(spark: SparkSession): DataFrame =
    read(spark, "catalog_listing")
  override def tableMeta(spark: SparkSession): DataFrame =
    read(spark, "table_meta")
  override def snapshots(spark: SparkSession): DataFrame =
    Normalize.snapshots(read(spark, "snapshots"))
  override def schemaVersions(spark: SparkSession): DataFrame =
    read(spark, "schema_versions")
  override def partitionSpecs(spark: SparkSession): DataFrame =
    read(spark, "partition_specs")
  override def appConfig(spark: SparkSession): DataFrame =
    read(spark, "app_config")
}

object FixtureCatalog {
  /** canonical fixture location (committed to the repo; scale-invariant) */
  val DefaultDir = "/root/repo/fixtures/meta"
  def default: FixtureCatalog = new FixtureCatalog(DefaultDir)
}
