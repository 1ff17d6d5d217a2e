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

  // ---- paged golden listings (r16 verdict task 1) -----------------------
  // The server ALWAYS paginates via pageToken/next-page-token:
  // namespaces split into 3 pages with an EMPTY-but-continuing middle
  // page, each namespace's tables into 2 pages (last partial) when it
  // has >1 table — so the frame-equality tests only pass if the client
  // walks the token chain to exhaustion.
  private def pagesOf[T](chunks: Seq[Seq[T]],
      render: (Seq[T], Option[String]) => String,
      pfx: String): Map[Option[String], String] =
    chunks.zipWithIndex.map { case (c, i) =>
      val self = if (i == 0) None else Some(s"$pfx$i")
      val next =
        if (i == chunks.length - 1) None else Some(s"$pfx${i + 1}")
      self -> render(c, next)
    }.toMap

  private lazy val nsPages: Map[Option[String], String] = {
    val nss = RestWire.parseNamespaces(
      new String(body("c_rest/namespaces.json").get, "UTF-8"))
    pagesOf(Seq(nss.take(1), Seq.empty[String], nss.drop(1)),
      (c: Seq[String], t: Option[String]) => RestWire.namespacesJson(c, t),
      "nsp")
  }

  private def tablePages(ns: String): Option[Map[Option[String], String]] =
    body(s"c_rest/tables/$ns.json").map { b =>
      val names = RestWire.parseTableIdents(new String(b, "UTF-8")).map(_._2)
      val chunks =
        if (names.size >= 2) Seq(names.dropRight(1), names.takeRight(1))
        else Seq(names)
      pagesOf(chunks,
        (c: Seq[String], t: Option[String]) =>
          RestWire.tableIdentsJson(ns, c, t), s"tbp-$ns-")
    }

  // tokens observed per listing route — proves every page was walked
  private val served =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]
  private def note(what: String, tok: Option[String]): Unit = {
    served.updateWith(what)(old =>
      Some(old.getOrElse(Set.empty) + tok.getOrElse("<first>")))
    ()
  }

  /** the golden routes served UNPAGED (single-page responses, no
    * next-page-token) — for the auth-focused servers where pagination
    * is not the behavior under test
    */
  private def routeUnpaged(path: String): Option[Array[Byte]] = path match {
    case "/v1/namespaces" => body("c_rest/namespaces.json")
    case LoadRe(ns, t) => body(s"c_rest/load/$ns.$t.json")
    case TablesRe(ns) => body(s"c_rest/tables/$ns.json")
    case _ => None
  }

  /** the REST route table over c_rest's payload files, listings paged */
  private def route(path: String,
      pageToken: Option[String]): Option[Array[Byte]] = path match {
    case "/v1/namespaces" =>
      note("namespaces", pageToken)
      nsPages.get(pageToken).map(_.getBytes("UTF-8"))
    case LoadRe(ns, t) => body(s"c_rest/load/$ns.$t.json")
    case TablesRe(ns) =>
      note(s"tables:$ns", pageToken)
      tablePages(ns).flatMap(_.get(pageToken)).map(_.getBytes("UTF-8"))
    case _ => None
  }

  private def handle(ex: HttpExchange): Unit = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
    val pageToken = Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").collectFirst {
        case kv if kv.startsWith("pageToken=") =>
          java.net.URLDecoder.decode(
            kv.stripPrefix("pageToken="), "UTF-8")
      })
    if (!auth.contains(s"Bearer $Token")) {
      ex.sendResponseHeaders(401, -1)
    } else route(ex.getRequestURI.getPath, pageToken) match {
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

  test("listings assemble across pageToken pages; every page is walked") {
    served.clear()
    assert(new RestHttpCatalog(registry(Token)).listing(spark).count() == 4)
    // 3 namespace pages: first, the empty-but-continuing middle, the
    // partial last
    assert(served("namespaces") == Set("<first>", "nsp1", "nsp2"))
    // the multi-table namespace walked both of its table pages
    assert(served("tables:sales").size == 2)
  }

  test("the /v1/config prefix re-roots every endpoint (multi-tenant server)") {
    // this server serves data ONLY under /v1/t1/... — a client that
    // skipped config adoption would 404 every listing and read empty
    val TablesR = "/v1/t1/namespaces/([^/]+)/tables".r
    val LoadR = "/v1/t1/namespaces/([^/]+)/tables/([^/]+)".r
    @volatile var configQuery: String = null
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: HttpExchange) =>
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $Token")) ex.sendResponseHeaders(401, -1)
      else {
        val resp: Option[Array[Byte]] = ex.getRequestURI.getPath match {
          case "/v1/config" =>
            configQuery = ex.getRequestURI.getRawQuery
            Some(RestWire.configJson(Map("clients" -> "4"),
              Map("prefix" -> "t1")).getBytes("UTF-8"))
          case "/v1/t1/namespaces" => body("c_rest/namespaces.json")
          case LoadR(ns, t) => body(s"c_rest/load/$ns.$t.json")
          case TablesR(ns) => body(s"c_rest/tables/$ns.json")
          case _ => None // unprefixed data paths do NOT exist here
        }
        resp match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      }
      ex.close()
    })
    srv.start()
    try {
      val c = new RestHttpCatalog(Seq(ConfigFx("c_rest", "rest", Map(
        "uri" -> s"http://127.0.0.1:${srv.getAddress.getPort}",
        "warehouse" -> "s3://warehouse", "auth_token" -> Token))))
      assert(rows(c.listing(spark)) ===
        rows(fix.listing(spark).filter(col("catalog_name") === "c_rest")))
      // the config request carried the configured warehouse
      assert(configQuery == "warehouse=s3%3A%2F%2Fwarehouse")
    } finally srv.stop(0)
  }

  test("OAuth2 client credentials: one mint, form-encoded, memoized across the walk") {
    val mints = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var mintForm: String = null
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: HttpExchange) =>
      if (ex.getRequestURI.getPath == "/v1/oauth/tokens" &&
          ex.getRequestMethod == "POST") {
        mints.incrementAndGet()
        mintForm = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val b = """{"access_token":"minted-xyz","token_type":"bearer"}"""
          .getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length.toLong)
        ex.getResponseBody.write(b)
      } else {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        if (!auth.contains("Bearer minted-xyz")) ex.sendResponseHeaders(401, -1)
        else routeUnpaged(ex.getRequestURI.getPath) match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      }
      ex.close()
    })
    srv.start()
    try {
      val c = new RestHttpCatalog(Seq(ConfigFx("c_rest", "rest", Map(
        "uri" -> s"http://127.0.0.1:${srv.getAddress.getPort}",
        "warehouse" -> "s3://warehouse",
        "credential" -> "cid:sec"))))
      assert(rows(c.listing(spark)) ===
        rows(fix.listing(spark).filter(col("catalog_name") === "c_rest")))
      // the whole walk (config + namespaces + tables + loads) minted ONCE
      assert(mints.get() == 1)
      val form = mintForm.split("&").toSet
      assert(form == Set("grant_type=client_credentials",
        "client_id=cid", "client_secret=sec", "scope=catalog"))
    } finally srv.stop(0)
  }

  test("a 401 on a minted token re-mints once and the request retries") {
    val mints = new java.util.concurrent.atomic.AtomicInteger(0)
    // tok-1 is valid for exactly ONE data request (expiry mid-walk);
    // every later request must carry the re-minted tok-2
    val tok1Budget = new java.util.concurrent.atomic.AtomicInteger(1)
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: HttpExchange) =>
      if (ex.getRequestURI.getPath == "/v1/oauth/tokens" &&
          ex.getRequestMethod == "POST") {
        val t = s"tok-${mints.incrementAndGet()}"
        val b = s"""{"access_token":"$t"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, b.length.toLong)
        ex.getResponseBody.write(b)
      } else {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        val ok = auth match {
          case Some("Bearer tok-1") => tok1Budget.getAndDecrement() > 0
          case Some("Bearer tok-2") => true
          case _ => false
        }
        if (!ok) ex.sendResponseHeaders(401, -1)
        else routeUnpaged(ex.getRequestURI.getPath) match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      }
      ex.close()
    })
    srv.start()
    try {
      val c = new RestHttpCatalog(Seq(ConfigFx("c_rest", "rest", Map(
        "uri" -> s"http://127.0.0.1:${srv.getAddress.getPort}",
        "warehouse" -> "s3://warehouse", "credential" -> "cid:sec"))))
      assert(c.listing(spark).count() == 4)
      assert(mints.get() == 2) // the expiry cost exactly one re-mint
    } finally srv.stop(0)
  }

  test("multi-level namespaces: %1F paths + parent walk enumerate the tree") {
    val US = "\u001F"
    val seenParents = scala.collection.concurrent.TrieMap.empty[String, Int]
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", { (ex: HttpExchange) =>
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains(s"Bearer $Token")) ex.sendResponseHeaders(401, -1)
      else {
        // getPath/getQuery DECODE the %1F — the raw URI must carry it
        val raw = ex.getRequestURI.toString
        val path = ex.getRequestURI.getPath
        val parent = Option(ex.getRequestURI.getQuery)
          .flatMap(_.split("&").collectFirst {
            case kv if kv.startsWith("parent=") =>
              java.net.URLDecoder.decode(kv.stripPrefix("parent="), "UTF-8")
          })
        val resp: Option[Array[Byte]] = path match {
          case "/v1/namespaces" =>
            parent.foreach { p =>
              assert(raw.contains("%1F") || !p.contains(US))
              seenParents.updateWith(p)(n => Some(n.getOrElse(0) + 1))
            }
            val nss = parent match {
              case None => Seq("ads", "sales")
              case Some("ads") => Seq("ads.eu")
              case Some(p) if p == s"ads${US}eu" => Seq.empty
              case Some("sales") => Seq.empty
              case _ => Seq.empty
            }
            Some(RestWire.namespacesJson(nss).getBytes("UTF-8"))
          case p if p == s"/v1/namespaces/ads${US}eu/tables" =>
            assert(raw.contains("%1F"))
            Some(RestWire.tableIdentsJson("ads.eu", Seq("clicks_eu"))
              .getBytes("UTF-8"))
          case p if p == s"/v1/namespaces/ads${US}eu/tables/clicks_eu" =>
            body("c_rest/load/ads.clicks.json") // reuse a golden payload
          case "/v1/namespaces/ads/tables" | "/v1/namespaces/sales/tables" =>
            Some(RestWire.tableIdentsJson("ads", Seq.empty).getBytes("UTF-8"))
          case _ => None
        }
        resp match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length.toLong)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
      }
      ex.close()
    })
    srv.start()
    try {
      val c = new RestHttpCatalog(Seq(ConfigFx("c_rest", "rest", Map(
        "uri" -> s"http://127.0.0.1:${srv.getAddress.getPort}",
        "warehouse" -> "s3://warehouse", "auth_token" -> Token))))
      val listing = c.listing(spark).collect()
        .map(r => (r.getAs[String]("namespace"), r.getAs[String]("table_name")))
      // the nested namespace's table enumerated, dotted display form
      assert(listing.toSet == Set(("ads.eu", "clicks_eu")))
      // every namespace was asked for children exactly once
      assert(seenParents.toMap ==
        Map("ads" -> 1, "sales" -> 1, s"ads${US}eu" -> 1))
    } finally srv.stop(0)
  }

  test("a 5xx is retried once; a dead endpoint fails with a clear message") {
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    flaky.createContext("/", { (ex: HttpExchange) =>
      hits.incrementAndGet()
      if (!failedOnce.getAndSet(true)) ex.sendResponseHeaders(502, -1)
      else handle(ex)
      ex.close()
    })
    flaky.start()
    try {
      val c = new RestHttpCatalog(Seq(ConfigFx("c_rest", "rest", Map(
        "uri" -> s"http://127.0.0.1:${flaky.getAddress.getPort}",
        "warehouse" -> "s3://warehouse", "auth_token" -> Token))))
      assert(c.listing(spark).count() == 4)
      assert(hits.get() >= 2) // the 502'd attempt plus its retry
    } finally flaky.stop(0)
    val dead = new RestHttpCatalog(Seq(ConfigFx("c_rest", "rest", Map(
      "uri" -> "http://127.0.0.1:9", "warehouse" -> "s3://warehouse"))))
    val e = intercept[RuntimeException](dead.listing(spark).count())
    assert(e.getMessage.contains("connection failed twice"))
  }
}
