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

/** Fixture-backed catalog over the parquet written by [[FixtureGen]].
  *
  * Reads are MEMOIZED per (session, table): the reference app memoizes
  * loaded catalog objects in HashMap caches (`main.rs:953-956`, SURVEY
  * §3.3), and the engine mirrors that at the fixture-read seam —
  * repeated query construction over one session reuses the same
  * DataFrame (plan) instead of re-listing files and re-reading parquet
  * footers on every call. The fixtures are immutable committed files,
  * so the memo can never serve stale plans; it is keyed by session so
  * a stopped session's plans are not resurrected.
  */
class FixtureCatalog(dir: String) extends MetaCatalog {
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]
  private def cached(spark: SparkSession, name: String)
      (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, name), build)
  private def read(spark: SparkSession, name: String): DataFrame =
    cached(spark, name)(spark.read.parquet(s"$dir/$name.parquet"))

  override def listing(spark: SparkSession): DataFrame =
    read(spark, "catalog_listing")
  override def tableMeta(spark: SparkSession): DataFrame =
    read(spark, "table_meta")
  override def snapshots(spark: SparkSession): DataFrame =
    cached(spark, "snapshots_normalized")(
      Normalize.snapshots(read(spark, "snapshots")))
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
