package graft.meta

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import Model.ConfigFx

/** LIVE S2 end-to-end: [[GlueHttpCatalog]] against a real localhost
  * HTTP server speaking the Glue JSON-RPC API (X-Amz-Target routes)
  * plus path-style S3 GetObject for the metadata files — with every
  * request's SigV4 signature VERIFIED by an INDEPENDENT server-side
  * recomputation (the check a real AWS endpoint performs) before any
  * payload is served: a wrong secret, a tampered header, or a
  * mis-canonicalized request gets 403, so the client's signing is
  * proven against a second implementation, not against itself.
  * Credentials resolve from a temp `~/.aws/credentials`-format file
  * via the `profile` key, exactly like the reference's Glue config.
  */
class GlueHttpCatalogSpec extends SparkSpec with BeforeAndAfterAll {

  private val Access = "AKIDGRAFTTEST"
  private val Secret = "graft-test-secret-key-123"
  private val Region = "us-east-1"
  private val FixDir = GluePayloadCatalog.DefaultDir

  // ---- independent server-side SigV4 verifier -------------------------
  // deliberately written from the published algorithm again (different
  // code shape from SigV4.scala): parse the Authorization header, rebuild
  // the canonical request from the RAW exchange, re-derive the signature
  private def hex(bs: Array[Byte]): String =
    bs.map(b => f"${b & 0xff}%02x").mkString
  private def sha(b: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))
  private def hm(key: Array[Byte], s: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(s.getBytes(UTF_8))
  }

  private def verify(ex: HttpExchange, payload: Array[Byte],
      service: String): Boolean = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .getOrElse(return false)
    val AuthRe =
      ("AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/([^/]+)/([^/]+)/" +
        "aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]+)").r
    auth match {
      case AuthRe(ak, date, region, svc, signedHeaders, gotSig) =>
        if (ak != Access || region != Region || svc != service) return false
        val amzDate = ex.getRequestHeaders.getFirst("x-amz-date")
        if (amzDate == null || !amzDate.startsWith(date)) return false
        val headerLines = signedHeaders.split(";").map { h =>
          val v = ex.getRequestHeaders.getFirst(h)
          if (v == null) return false
          s"$h:${v.trim}\n"
        }.mkString
        // the spec's service asymmetry, derived independently on the
        // server side: S3 canonicalizes the wire path verbatim; every
        // other service re-encodes the path it RECEIVED (so the
        // canonical form is the double-encoding of the raw path)
        val rawPath = ex.getRequestURI.getRawPath
        val canonPath =
          if (svc == "s3") rawPath
          else rawPath.split("/", -1).map { seg =>
            seg.getBytes(UTF_8).map { b =>
              if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
                (b >= '0' && b <= '9') ||
                b == '-' || b == '_' || b == '.' || b == '~')
                b.toChar.toString
              else f"%%${b & 0xff}%02X"
            }.mkString
          }.mkString("/")
        val canonical = Seq(
          ex.getRequestMethod.toUpperCase,
          canonPath,
          Option(ex.getRequestURI.getRawQuery).getOrElse(""),
          headerLines, signedHeaders, sha(payload)).mkString("\n")
        val sts = Seq("AWS4-HMAC-SHA256", amzDate,
          s"$date/$region/$svc/aws4_request",
          sha(canonical.getBytes(UTF_8))).mkString("\n")
        val kSig = hm(hm(hm(hm(("AWS4" + Secret).getBytes(UTF_8),
          date), region), svc), "aws4_request")
        hex(hm(kSig, sts)) == gotSig
      case _ => false
    }
  }

  // ---- routes ----------------------------------------------------------
  private def fileBody(rel: String): Option[Array[Byte]] = {
    val p = Paths.get(FixDir, rel)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  private def respond(ex: HttpExchange, code: Int,
      body: Option[Array[Byte]]): Unit = {
    body match {
      case Some(b) =>
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, b.length.toLong)
        ex.getResponseBody.write(b)
      case None => ex.sendResponseHeaders(code, -1)
    }
    ex.close()
  }

  // ---- paged golden listings -------------------------------------------
  // The server ALWAYS paginates (r16 verdict task 1 "done" shape):
  // GetDatabases splits into 3 pages with the last partial, GetTables
  // into 2 pages per database with >1 table — so the main end-to-end
  // frame-equality test only passes if the client walks NextToken to
  // exhaustion. Page splitting is server-side only; the golden payload
  // files stay single-page for the m25/m26 payload-catalog path.
  private def pagesOf[T](chunks: Seq[Seq[T]],
      render: (Seq[T], Option[String]) => String,
      pfx: String): Map[Option[String], String] =
    chunks.zipWithIndex.map { case (c, i) =>
      val self = if (i == 0) None else Some(s"$pfx$i")
      val next =
        if (i == chunks.length - 1) None else Some(s"$pfx${i + 1}")
      self -> render(c, next)
    }.toMap

  private lazy val dbPages: Map[Option[String], String] = {
    val dbs = GlueWire.parseDatabases(
      new String(fileBody("c_glue/databases.json").get, UTF_8))
    require(dbs.size >= 2, s"paged-spec shape needs >=2 dbs, got $dbs")
    // 3 pages, the middle one EMPTY-but-continuing (legal Glue
    // behavior: a page may carry a NextToken and no entries — a client
    // that treats an empty page as terminal truncates), the last one
    // partial
    pagesOf(Seq(dbs.take(1), Seq.empty[String], dbs.drop(1)),
      (c: Seq[String], t: Option[String]) => GlueWire.getDatabasesJson(c, t),
      "dbp")
  }

  private def tablePages(db: String): Option[Map[Option[String], String]] =
    fileBody(s"c_glue/tables/$db.json").map { b =>
      val ts = GlueWire.parseTables(new String(b, UTF_8))
      val chunks =
        if (ts.size >= 2) Seq(ts.take(1), ts.drop(1)) else Seq(ts)
      pagesOf(chunks,
        (c: Seq[GlueWire.GlueTableFx], t: Option[String]) =>
          GlueWire.getTablesJson(c, t), s"tbp-$db-")
    }

  // tokens observed per target — proves multiple pages were walked
  private val served =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]
  private def note(target: String, tok: Option[String]): Unit = {
    served.updateWith(target)(old =>
      Some(old.getOrElse(Set.empty) + tok.getOrElse("<first>")))
    ()
  }

  private def handleGlue(ex: HttpExchange): Unit = {
    val payload = ex.getRequestBody.readAllBytes()
    if (!verify(ex, payload, "glue")) { respond(ex, 403, None); return }
    val target = ex.getRequestHeaders.getFirst("X-Amz-Target")
    val body = new String(payload, UTF_8)
    val reqToken = "\"NextToken\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(body).map(_.group(1))
    target match {
      case "AWSGlue.GetDatabases" =>
        note(target, reqToken)
        dbPages.get(reqToken) match {
          case Some(page) => respond(ex, 200, Some(page.getBytes(UTF_8)))
          case None => respond(ex, 400, None) // unknown token
        }
      case "AWSGlue.GetTables" =>
        val db = "\"DatabaseName\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(body).map(_.group(1))
        note(s"$target:${db.getOrElse("?")}", reqToken)
        db.flatMap(tablePages).flatMap(_.get(reqToken)) match {
          case Some(page) => respond(ex, 200, Some(page.getBytes(UTF_8)))
          case None => respond(ex, 400, Some(
            """{"__type":"EntityNotFoundException","Message":"nope"}"""
              .getBytes(UTF_8)))
        }
      case _ => respond(ex, 400, None)
    }
  }

  private def handleS3(ex: HttpExchange): Unit = {
    if (!verify(ex, Array.emptyByteArray, "s3")) {
      respond(ex, 403, None); return
    }
    // /{bucket}/{key} → the fixture metadata file for s3://bucket/key
    val path = ex.getRequestURI.getPath.stripPrefix("/")
    val slash = path.indexOf('/')
    val loc = s"s3://${path.take(slash)}/${path.drop(slash + 1)}"
    fileBody(s"c_glue/metadata/${GlueWire.locationKey(loc)}.json") match {
      case Some(b) => respond(ex, 200, Some(b))
      case None => respond(ex, 404, None)
    }
  }

  private var glueServer: HttpServer = _
  private var s3Server: HttpServer = _
  private var credsPath: java.nio.file.Path = _
  private var cfg: ConfigFx = _

  override def beforeAll(): Unit = {
    glueServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    glueServer.createContext("/", handleGlue _)
    glueServer.start()
    s3Server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s3Server.createContext("/", handleS3 _)
    s3Server.start()
    credsPath = Files.createTempFile("graft-aws-creds", "")
    Files.writeString(credsPath,
      s"""[default]
         |aws_access_key_id = WRONG
         |aws_secret_access_key = WRONG
         |[prod]
         |aws_access_key_id = $Access
         |aws_secret_access_key = $Secret
         |""".stripMargin)
    cfg = ConfigFx("c_glue", "glue", Map(
      "warehouse" -> "s3://warehouse",
      "region" -> Region,
      "profile" -> "prod",
      "endpoint_url" -> s"http://127.0.0.1:${glueServer.getAddress.getPort}",
      "s3_endpoint_url" -> s"http://127.0.0.1:${s3Server.getAddress.getPort}"))
  }

  override def afterAll(): Unit = {
    if (glueServer != null) glueServer.stop(0)
    if (s3Server != null) s3Server.stop(0)
    if (credsPath != null) Files.deleteIfExists(credsPath)
    ()
  }

  private def cat(c: ConfigFx = cfg) =
    new GlueHttpCatalog(Seq(c), credsFile = credsPath,
      env = Map.empty) // force the profile-file path, not ambient env

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
  private def glueOnly(df: DataFrame, c: String): DataFrame =
    df.filter(org.apache.spark.sql.functions.col(c) === "c_glue")

  test("live HTTP Glue path serves the fixture catalog frames exactly") {
    val fix = FixtureCatalog.default
    val http = cat()
    assert(rows(http.listing(spark)) ==
      rows(glueOnly(fix.listing(spark), "catalog_name")))
    assert(rows(http.snapshots(spark)) ==
      rows(glueOnly(fix.snapshots(spark), "catalog")))
    assert(rows(http.schemaVersions(spark)) ==
      rows(glueOnly(fix.schemaVersions(spark), "catalog")))
    assert(rows(http.partitionSpecs(spark)) ==
      rows(glueOnly(fix.partitionSpecs(spark), "catalog")))
    assert(rows(http.tableMeta(spark)) ==
      rows(glueOnly(fix.tableMeta(spark), "catalog")))
  }

  test("listings assemble across NextToken pages; every page is walked") {
    served.clear()
    assert(cat().listing(spark).count() == 4)
    // 3 GetDatabases pages: first (no token), the empty middle, the
    // partial last — all three tokens observed server-side
    assert(served("AWSGlue.GetDatabases") == Set("<first>", "dbp1", "dbp2"))
    // each database's GetTables walked both pages
    assert(served("AWSGlue.GetTables:ml").size == 2)
    assert(served("AWSGlue.GetTables:tmp").size == 2)
  }

  test("a 5xx is retried once and the retry is re-signed with a fresh x-amz-date") {
    val dates = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val flaky = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    flaky.createContext("/", { (ex: HttpExchange) =>
      val payload = ex.getRequestBody.readAllBytes()
      dates.add(ex.getRequestHeaders.getFirst("x-amz-date"))
      if (!failedOnce.getAndSet(true))
        respond(ex, 500, Some("transient".getBytes(UTF_8)))
      else if (!verify(ex, payload, "glue")) respond(ex, 403, None)
      else ex.getRequestHeaders.getFirst("X-Amz-Target") match {
        case "AWSGlue.GetDatabases" =>
          respond(ex, 200, fileBody("c_glue/databases.json"))
        case _ =>
          val db = "\"DatabaseName\"\\s*:\\s*\"([^\"]+)\"".r
            .findFirstMatchIn(new String(payload, UTF_8)).map(_.group(1))
          respond(ex, 200, db.flatMap(d => fileBody(s"c_glue/tables/$d.json")))
      }
    })
    flaky.start()
    try {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val c = new GlueHttpCatalog(
        Seq(ConfigFx("c_glue", "glue", cfg.config + ("endpoint_url" ->
          s"http://127.0.0.1:${flaky.getAddress.getPort}"))),
        credsFile = credsPath, env = Map.empty,
        amzDate = () => f"20260816T${n.incrementAndGet()}%06dZ")
      assert(c.listing(spark).count() == 4)
      // the 500'd attempt and its retry carry DIFFERENT x-amz-date
      // values (and the retry's signature verified, or it would 403)
      assert(dates.size >= 2 && dates.get(0) != dates.get(1))
    } finally flaky.stop(0)
  }

  test("a dead endpoint fails after the bounded retry with a clear message") {
    // no listener on the port: both attempts throw connect exceptions
    val c = new GlueHttpCatalog(
      Seq(ConfigFx("c_glue", "glue",
        cfg.config + ("endpoint_url" -> "http://127.0.0.1:9"))),
      credsFile = credsPath, env = Map.empty)
    val e = intercept[RuntimeException] { c.listing(spark).count() }
    assert(e.getMessage.contains("connection failed twice"))
  }

  test("a path-bearing endpoint with reserved chars double-encodes the canonical path") {
    // '/gw v1' (sent single-encoded as /gw%20v1) only verifies if the
    // client canonicalized the DOUBLE-encoded form — the server-side
    // recomputation re-encodes the received path per the spec
    val c2 = ConfigFx("c_glue", "glue", cfg.config + ("endpoint_url" ->
      s"http://127.0.0.1:${glueServer.getAddress.getPort}/gw%20v1"))
    assert(cat(c2).listing(spark).count() == 4)
  }

  test("a wrong secret is refused by the server-side recomputation") {
    val bad = Files.createTempFile("graft-aws-creds-bad", "")
    Files.writeString(bad,
      s"""[prod]
         |aws_access_key_id = $Access
         |aws_secret_access_key = not-the-secret
         |""".stripMargin)
    val c = new GlueHttpCatalog(Seq(cfg), credsFile = bad, env = Map.empty)
    val e = intercept[RuntimeException] { c.listing(spark).collect() }
    assert(e.getMessage.contains("403"))
    Files.deleteIfExists(bad)
    ()
  }

  test("credentials resolve from env ahead of the profile file") {
    // env chain head: a wrong file + right env must succeed
    val bad = Files.createTempFile("graft-aws-creds-absent", "")
    Files.deleteIfExists(bad)
    val c = new GlueHttpCatalog(Seq(cfg), credsFile = bad,
      env = Map("AWS_ACCESS_KEY_ID" -> Access,
        "AWS_SECRET_ACCESS_KEY" -> Secret))
    assert(c.listing(spark).count() == 4)
  }

  test("a dangling metadata pointer classifies unknown over live S3") {
    // redirect every pointer into a bucket the S3 route has no fixture
    // files for: each signed GetObject comes back a clean 404 and the
    // probe classifies every identifier unknown — derived, not copied
    val u = new GlueHttpCatalog(Seq(cfg), credsFile = credsPath,
      env = Map.empty) {
      override protected def metadataDoc(cfgX: ConfigFx,
          location: String): Option[String] =
        super.metadataDoc(cfgX, location.replace("s3://warehouse",
          "s3://warehouse-missing"))
    }
    val types = u.listing(spark).collect()
      .map(_.getAs[String]("table_type")).toSet
    assert(types == Set("unknown"))
  }
}
