package graft.meta

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import Model.ConfigFx

/** LIVE S1 end-to-end: [[RestHttpCatalog]] against a real localhost
  * HTTP server speaking the Iceberg REST endpoint layout over the
  * golden wire payloads — Bearer auth enforced, 404 probe for the
  * unknown table, non-200 fail-fast. The HTTP client path must serve
  * the same frames as the parquet-fixture catalog restricted to the
  * `rest`-typed connection.
  */
class RestHttpCatalogSpec extends SparkSpec with BeforeAndAfterAll {

  private val Token = "sekrit-token-123"
  private val FixDir = RestPayloadCatalog.DefaultDir

  private def body(rel: String): Option[Array[Byte]] = {
    val p = Paths.get(FixDir, rel)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  private val TablesRe = "/v1/namespaces/([^/]+)/tables".r
  private val LoadRe = "/v1/namespaces/([^/]+)/tables/([^/]+)".r

  /** the REST route table over c_rest's payload files */
  private def route(path: String): Option[Array[Byte]] = path match {
    case "/v1/namespaces" => body("c_rest/namespaces.json")
    case LoadRe(ns, t) => body(s"c_rest/load/$ns.$t.json")
    case TablesRe(ns) => body(s"c_rest/tables/$ns.json")
    case _ => None
  }

  private def handle(ex: HttpExchange): Unit = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
    if (!auth.contains(s"Bearer $Token")) {
      ex.sendResponseHeaders(401, -1)
    } else route(ex.getRequestURI.getPath) match {
      case Some(b) =>
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, b.length.toLong)
        ex.getResponseBody.write(b)
      case None => ex.sendResponseHeaders(404, -1)
    }
    ex.close()
  }

  private var server: HttpServer = _
  private var baseUri: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", handle _)
    server.start()
    baseUri = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def registry(token: String): Seq[ConfigFx] = Seq(
    ConfigFx("c_rest", "rest", Map(
      "uri" -> baseUri, "warehouse" -> "s3://warehouse",
      "auth_token" -> token)),
    // a non-rest connection: must contribute nothing over this transport
    ConfigFx("c_glue", "glue", Map(
      "warehouse" -> "s3://warehouse", "region" -> "us-east-1")))

  private lazy val http = new RestHttpCatalog(registry(Token))
  private lazy val fix = FixtureCatalog.default

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

  private def restOnly(df: DataFrame): DataFrame =
    df.filter(col("catalog") === "c_rest")

  test("listing over live HTTP matches the fixture catalog's rest slice") {
    assert(rows(http.listing(spark)) ===
      rows(fix.listing(spark).filter(col("catalog_name") === "c_rest")))
  }

  test("the unloadable table classifies unknown via a real 404 probe") {
    val unknown = http.listing(spark)
      .filter(col("table_type") === "unknown")
      .collect().map(_.getAs[String]("table_name")).toSet
    assert(unknown === Set("legacy_csv"))
  }

  test("snapshots / schemas / specs / heads round-trip over HTTP") {
    assert(rows(http.snapshots(spark)) === rows(restOnly(fix.snapshots(spark))))
    assert(rows(http.schemaVersions(spark)) ===
      rows(restOnly(fix.schemaVersions(spark))))
    assert(rows(http.partitionSpecs(spark)) ===
      rows(restOnly(fix.partitionSpecs(spark))))
    assert(rows(http.tableMeta(spark)) === rows(restOnly(fix.tableMeta(spark))))
  }

  test("a bad token fails fast with the HTTP status, not empty frames") {
    val bad = new RestHttpCatalog(registry("wrong-token"))
    val e = intercept[RuntimeException](bad.listing(spark))
    assert(e.getMessage.contains("HTTP 401"))
  }
}
