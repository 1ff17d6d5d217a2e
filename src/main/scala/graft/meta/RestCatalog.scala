package graft.meta

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import Model._

/** [[MetaCatalog]] over Iceberg REST API response payloads on disk
  * (S1/S2): the full client path MINUS transport. Directory layout (one
  * file per endpoint response):
  *
  * {{{
  *   <dir>/catalogs.json                  // the connection registry (S3/S8)
  *   <dir>/<catalog>/namespaces.json      // GET /v1/namespaces
  *   <dir>/<catalog>/tables/<ns>.json     // GET /v1/namespaces/{ns}/tables
  *   <dir>/<catalog>/load/<ns>.<t>.json   // GET .../tables/{t} (LoadTableResponse)
  * }}}
  *
  * Classification runs the reference's PROBE semantics
  * (`src/catalog.rs:342-375`): an identifier listed by the tables
  * endpoint whose load request has no metadata — here, no response
  * file — classifies "unknown"; a loadable one is "iceberg". A live
  * deployment replaces [[payload]] with an HTTP GET (+ auth header from
  * the registry config) — every byte after the transport is exercised
  * here, wire format included ([[RestWire]]), and m23/m24 drive it
  * through the DuckDB oracle gate against the parquet-fixture catalog.
  */
class RestPayloadCatalog(dir: String) extends MetaCatalog {

  /** the transport seam: response body for a path under `dir` */
  protected def payload(rel: String): Option[String] = {
    val p = Paths.get(dir, rel)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  private case class Parsed(
      listing: Seq[ListingFx], meta: Seq[TableMetaFx],
      schemas: Seq[SchemaFx], specs: Seq[SpecFx], snaps: Seq[SnapshotFx],
      configs: Seq[ConfigFx])

  /** one driver-side parse of every response payload (KB-sized, like
    * the reference's in-memory catalog objects), memoized per instance
    */
  private lazy val parsed: Parsed = {
    val cfgJson = payload("catalogs.json").getOrElse("""{"catalogs":[]}""")
    val configs = RestWire.parseCatalogs(cfgJson)
    val acc = configs.map { cfg =>
      val cat = cfg.name
      val nss = payload(s"$cat/namespaces.json")
        .map(RestWire.parseNamespaces).getOrElse(Seq.empty)
      val idents = nss.flatMap { ns =>
        payload(s"$cat/tables/$ns.json")
          .map(RestWire.parseTableIdents).getOrElse(Seq.empty)
      }
      val loaded = idents.flatMap { case (ns, t) =>
        payload(s"$cat/load/$ns.$t.json")
          .map(j => (ns, t) -> RestWire.parseLoadTable(cat, ns, t, j))
      }.toMap
      val listing = idents.map { case (ns, t) =>
        ListingFx(cat, cfg.catalog_type, ns, t,
          if (loaded.contains((ns, t))) "iceberg" else "unknown")
      }
      val l = loaded.values.toSeq
      (listing, l.map(_._1), l.flatMap(_._2), l.flatMap(_._3),
        l.flatMap(_._4))
    }
    Parsed(acc.flatMap(_._1), acc.flatMap(_._2), acc.flatMap(_._3),
      acc.flatMap(_._4), acc.flatMap(_._5), configs)
  }

  private def ds[T <: Product : scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, rows: Seq[T]): DataFrame =
    spark.createDataFrame(rows)

  override def listing(spark: SparkSession): DataFrame =
    ds(spark, parsed.listing)
  override def tableMeta(spark: SparkSession): DataFrame =
    ds(spark, parsed.meta)
  override def snapshots(spark: SparkSession): DataFrame =
    Normalize.snapshots(ds(spark, parsed.snaps))
  override def schemaVersions(spark: SparkSession): DataFrame =
    ds(spark, parsed.schemas)
  override def partitionSpecs(spark: SparkSession): DataFrame =
    ds(spark, parsed.specs)
  override def appConfig(spark: SparkSession): DataFrame =
    ds(spark, parsed.configs)
}

object RestPayloadCatalog {
  val DefaultDir = "/root/repo/fixtures/rest"
  def default: RestPayloadCatalog = new RestPayloadCatalog(DefaultDir)
}

/** Renders the golden fixture population ([[FixtureGen]]) as Iceberg
  * REST response payloads under `fixtures/rest/` — the same tables,
  * schemas, specs, and snapshots, serialized through the real wire
  * format. Tables the parquet fixtures classify "unknown" get a listing
  * identifier but NO LoadTableResponse file, so the probe semantics
  * reproduce the classification instead of copying it.
  */
object RestFixtureGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(RestPayloadCatalog.DefaultDir)
    val bySnap = FixtureGen.snapshots.groupBy(s =>
      (s.catalog, s.namespace, s.name))
    val bySchema = FixtureGen.schemas.groupBy(s =>
      (s.catalog, s.namespace, s.name))
    val bySpec = FixtureGen.specs.groupBy(s =>
      (s.catalog, s.namespace, s.name))
    def write(rel: String, body: String): Unit = {
      val p = Paths.get(out, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
      ()
    }
    write("catalogs.json", RestWire.catalogsJson(FixtureGen.appConfig))
    FixtureGen.listing.groupBy(_.catalog_name).foreach { case (cat, rows) =>
      val nss = rows.map(_.namespace).distinct.sorted
      write(s"$cat/namespaces.json", RestWire.namespacesJson(nss))
      rows.groupBy(_.namespace).foreach { case (ns, ts) =>
        write(s"$cat/tables/$ns.json",
          RestWire.tableIdentsJson(ns, ts.map(_.table_name).sorted))
      }
    }
    FixtureGen.tableMeta.foreach { m =>
      val key = (m.catalog, m.namespace, m.name)
      write(s"${m.catalog}/load/${m.namespace}.${m.name}.json",
        RestWire.loadTableJson(m, bySchema.getOrElse(key, Seq.empty),
          bySpec.getOrElse(key, Seq.empty),
          bySnap.getOrElse(key, Seq.empty)))
    }
    println(s"[rest-fixtures] written to $out")
  }
}
