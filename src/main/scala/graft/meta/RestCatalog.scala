package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}

import Model._

/** The Iceberg REST catalog CLIENT (S1/S2): everything above the
  * transport. Subclasses supply the three endpoint reads —
  *
  *   - `GET /v1/{prefix}/namespaces`
  *   - `GET /v1/{prefix}/namespaces/{ns}/tables`
  *   - `GET /v1/{prefix}/namespaces/{ns}/tables/{t}` (LoadTableResponse)
  *
  * — as `Option[String]` response bodies (`None` = 404). Wire-format
  * parse ([[RestWire]]), the reference's PROBE classification
  * (`src/catalog.rs:342-375`: an identifier whose load request finds no
  * metadata classifies "unknown"; a loadable one "iceberg"), and the
  * [[MetaCatalog]] surface all live here, so the file-backed and live
  * HTTP transports serve byte-identical frames.
  *
  * Parsing runs DRIVER-SIDE (catalog metadata is KB-sized, mirroring the
  * reference's in-memory client structs, `src/iceberg_adapter.rs:11-65`);
  * the parse is memoized per instance like the reference's catalog cache.
  */
abstract class RestClientCatalog extends MetaCatalog {

  /** the connection registry this client serves (reference `AppConfig`) */
  protected def registry: Seq[ConfigFx]

  // ---- the transport seam: one method per REST endpoint ----------------
  // The two listing endpoints take the page's continuation token (None
  // = first page): the Iceberg REST spec paginates listings via the
  // `pageToken` query parameter / `next-page-token` response field, and
  // the paging loop ([[Paging]]) lives HERE so both transports serve
  // complete listings (r16 verdict task 1).
  protected def namespacesDoc(cfg: ConfigFx,
      pageToken: Option[String]): Option[String]
  protected def tablesDoc(cfg: ConfigFx, ns: String,
      pageToken: Option[String]): Option[String]
  protected def loadTableDoc(cfg: ConfigFx, ns: String, t: String): Option[String]

  private case class Parsed(
      listing: Seq[ListingFx], meta: Seq[TableMetaFx],
      schemas: Seq[SchemaFx], specs: Seq[SpecFx], snaps: Seq[SnapshotFx],
      configs: Seq[ConfigFx])

  private lazy val parsed: Parsed = {
    val configs = registry
    val acc = configs.map { cfg =>
      val cat = cfg.name
      val nss = Paging.collect(s"$cat namespaces",
        namespacesDoc(cfg, _), RestWire.parseNamespaces,
        RestWire.parseNextPageToken)
      val idents = nss.flatMap { ns =>
        Paging.collect(s"$cat tables($ns)",
          tablesDoc(cfg, ns, _), RestWire.parseTableIdents,
          RestWire.parseNextPageToken)
      }
      val loaded = idents.flatMap { case (ns, t) =>
        loadTableDoc(cfg, ns, t)
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

/** [[RestClientCatalog]] over response payloads on disk — the wire
  * format without a server. Directory layout (one file per endpoint
  * response):
  *
  * {{{
  *   <dir>/catalogs.json                  // the connection registry (S3/S8)
  *   <dir>/<catalog>/namespaces.json      // GET /v1/namespaces
  *   <dir>/<catalog>/tables/<ns>.json     // GET /v1/namespaces/{ns}/tables
  *   <dir>/<catalog>/load/<ns>.<t>.json   // GET .../tables/{t} (LoadTableResponse)
  * }}}
  *
  * m23/m24 drive this path through the DuckDB oracle gate against the
  * parquet-fixture catalog; an absent load file reproduces the
  * 404-probe "unknown" classification.
  */
class RestPayloadCatalog(dir: String) extends RestClientCatalog {

  protected def payload(rel: String): Option[String] = {
    val p = Paths.get(dir, rel)
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  override protected lazy val registry: Seq[ConfigFx] =
    RestWire.parseCatalogs(
      payload("catalogs.json").getOrElse("""{"catalogs":[]}"""))

  // continuation pages live next to the first page, keyed by token
  override protected def namespacesDoc(cfg: ConfigFx,
      pageToken: Option[String]): Option[String] =
    payload(pageToken.fold(s"${cfg.name}/namespaces.json")(t =>
      s"${cfg.name}/namespaces.$t.json"))
  override protected def tablesDoc(cfg: ConfigFx, ns: String,
      pageToken: Option[String]): Option[String] =
    payload(pageToken.fold(s"${cfg.name}/tables/$ns.json")(t =>
      s"${cfg.name}/tables/$ns.$t.json"))
  override protected def loadTableDoc(cfg: ConfigFx, ns: String,
      t: String): Option[String] =
    payload(s"${cfg.name}/load/$ns.$t.json")
}

object RestPayloadCatalog {
  val DefaultDir = "/root/repo/fixtures/rest"
  def default: RestPayloadCatalog = new RestPayloadCatalog(DefaultDir)
}

/** LIVE S1: [[RestClientCatalog]] over real HTTP (`java.net.http`,
  * JDK-native — no added dependency). Each `rest`-typed registry entry
  * is served from its configured `uri` with `Authorization: Bearer
  * <auth_token>` when the config carries a token; a 404 load response
  * classifies the identifier "unknown" (the probe), any other non-200
  * fails fast with the status in the message. Non-`rest` entries (Glue)
  * contribute nothing here — that transport needs the AWS SDK, which
  * stays the one documented seam (SURVEY §0, offline build).
  *
  * r17: the client fetches `GET /v1/config` once per catalog (with the
  * `warehouse` query param when configured) and adopts the server's
  * `prefix` — every other endpoint then lives at `/v1/{prefix}/...`,
  * the multi-tenant REST-catalog layout; a server without the config
  * endpoint (404) serves unprefixed paths as before. Remaining
  * spec-true simplification: namespace identifiers are single-level,
  * so no `%1F` multipart encoding is needed. RestHttpCatalogSpec
  * drives this client against real localhost HTTP servers serving the
  * golden wire payloads — auth header, 404 probe, pagination, retry,
  * prefix adoption, and error path included.
  */
class RestHttpCatalog(override protected val registry: Seq[ConfigFx])
    extends RestClientCatalog {

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  // one /v1/config fetch per catalog (the reference SDK does this at
  // client construction); "" = unprefixed, "p/" = every endpoint under
  // /v1/p/. Memoized — listings would otherwise re-pay it per endpoint.
  // keyed by (name, uri), not name alone (r17 advice): two registry
  // entries sharing a name but pointing at different servers must not
  // reuse each other's /v1/config prefix.
  private val prefixMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def prefixOf(cfg: ConfigFx): String =
    prefixMemo.getOrElseUpdate((cfg.name, cfg.config.getOrElse("uri", "")), {
      val q = cfg.config.get("warehouse").map(w => "?warehouse=" +
        java.net.URLEncoder.encode(w,
          java.nio.charset.StandardCharsets.UTF_8)).getOrElse("")
      get(cfg, s"/v1/config$q") match {
        case Some(body) => RestWire.parseConfig(body).get("prefix")
          .filter(_.nonEmpty).map(_.stripSuffix("/") + "/").getOrElse("")
        case None => "" // no config endpoint — a bare single-tenant server
      }
    })

  /** one bounded retry on a 5xx or a connection-level IOException —
    * transport robustness matching the Glue client (r16 verdict task 2)
    */
  private def get(cfg: ConfigFx, path: String,
      pageToken: Option[String] = None): Option[String] = {
    val base = cfg.config.getOrElse("uri",
      sys.error(s"catalog ${cfg.name}: no uri in registry config"))
    val q = pageToken.fold("")(t => "?pageToken=" +
      java.net.URLEncoder.encode(t, java.nio.charset.StandardCharsets.UTF_8))
    val b = HttpRequest.newBuilder(
        URI.create(base.stripSuffix("/") + path + q))
      .timeout(Duration.ofSeconds(30)).GET()
    cfg.config.get("auth_token")
      .foreach(t => b.header("Authorization", s"Bearer $t"))
    val req = b.build()
    HttpRetry.sendTwice(s"GET $base$path$q", () => {
      val r = client.send(req, HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }) match {
      case (200, body) => Some(body)
      case (404, _) => None
      case (code, _) => sys.error(s"GET $base$path$q -> HTTP $code")
    }
  }

  private def rest(cfg: ConfigFx)(req: => Option[String]): Option[String] =
    if (cfg.catalog_type == "rest") req else None

  override protected def namespacesDoc(cfg: ConfigFx,
      pageToken: Option[String]): Option[String] =
    rest(cfg)(get(cfg, s"/v1/${prefixOf(cfg)}namespaces", pageToken))
  override protected def tablesDoc(cfg: ConfigFx, ns: String,
      pageToken: Option[String]): Option[String] =
    rest(cfg)(get(cfg, s"/v1/${prefixOf(cfg)}namespaces/$ns/tables",
      pageToken))
  override protected def loadTableDoc(cfg: ConfigFx, ns: String,
      t: String): Option[String] =
    rest(cfg)(get(cfg, s"/v1/${prefixOf(cfg)}namespaces/$ns/tables/$t"))
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
