package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import Model._

/** Iceberg REST catalog WIRE FORMAT (S1, reference
  * `/root/reference/src/catalog.rs:154-186`): render + parse of the
  * response payloads the REST catalog API serves —
  *
  *   - `GET /v1/{prefix}/namespaces`            → `{"namespaces": [["sales"], ...]}`
  *   - `GET /v1/{prefix}/namespaces/{ns}/tables` → `{"identifiers": [{"namespace": ["ns"], "name": "t"}, ...]}`
  *   - `GET /v1/{prefix}/namespaces/{ns}/tables/{t}` → `LoadTableResponse`
  *     `{"metadata-location": "...", "metadata": {<TableMetadata v2>}}`
  *
  * per the public Iceberg REST OpenAPI spec + the TableMetadata v2 JSON
  * layout (format-version / schemas / current-schema-id /
  * partition-specs / default-spec-id / snapshots / current-snapshot-id /
  * properties). Parsing runs DRIVER-SIDE with Jackson (on every Spark
  * classpath): catalog metadata is KB-sized, and this mirrors the
  * reference exactly — its `iceberg` crate parses the HTTP body into
  * client structs before any query touches them
  * (`src/iceberg_adapter.rs:11-65`). The parsed objects land in the SAME
  * [[Model]] case classes the fixture catalog serves, so every
  * downstream operator is wire-format-agnostic.
  *
  * Spec-true simplifications (documented, not hidden): single-level
  * namespaces; nested struct/list/map types round-trip through the
  * reference's RENDERED type strings ("struct", "list<float>") rather
  * than fully-elaborated nested field trees (the reference renders
  * exactly these, `src/data.rs:65-86`); a snapshot's `summary` is
  * written verbatim from the model (absent → omitted), which feeds the
  * P7 operation-inference path the reference runs on underspecified
  * summaries.
  */
object RestWire {

  private val M = new ObjectMapper()

  // ---- render (the fixture-authoring / server side) --------------------

  /** `nextPageToken` when this page is NOT the last — the REST spec's
    * `next-page-token` field on every listing response (servers that
    * paginate return it until the final page)
    */
  def namespacesJson(nss: Seq[String],
      nextPageToken: Option[String] = None): String = {
    val root = M.createObjectNode()
    val arr = root.putArray("namespaces")
    // the dotted display form splits back into spec levels (r18
    // multi-level support — the write-side inverse of
    // [[parseNamespaces]]'s join; single-level output is unchanged)
    nss.foreach { ns =>
      val a = arr.addArray(); ns.split('.').foreach(a.add); ()
    }
    nextPageToken.foreach(root.put("next-page-token", _))
    root.toPrettyString
  }

  def tableIdentsJson(ns: String, names: Seq[String],
      nextPageToken: Option[String] = None): String = {
    val root = M.createObjectNode()
    val arr = root.putArray("identifiers")
    names.foreach { n =>
      val o = arr.addObject()
      val a = o.putArray("namespace")
      ns.split('.').foreach(a.add)
      o.put("name", n)
    }
    nextPageToken.foreach(root.put("next-page-token", _))
    root.toPrettyString
  }

  /** flat rendered type → wire type node (inverse of [[flatType]]) */
  private def wireType(o: ObjectNode, key: String, t: String): Unit =
    if (t == "struct") {
      val n = o.putObject(key)
      n.put("type", "struct"); n.putArray("fields"); ()
    } else if (t.startsWith("list<") && t.endsWith(">")) {
      val n = o.putObject(key)
      n.put("type", "list")
      n.put("element", t.stripPrefix("list<").stripSuffix(">"))
      n.put("element-required", false); ()
    } else { o.put(key, t); () }

  def loadTableJson(meta: TableMetaFx, schemas: Seq[SchemaFx],
      specs: Seq[SpecFx], snaps: Seq[SnapshotFx]): String = {
    val root = M.createObjectNode()
    root.put("metadata-location", s"${meta.location}/metadata/v1.metadata.json")
    renderMetadataInto(root.putObject("metadata"), meta, schemas, specs, snaps)
    root.toPrettyString
  }

  /** the standalone TableMetadata FILE (what `metadata_location` points
    * at) — the same v2 object LoadTableResponse nests under `metadata`;
    * the Glue path ([[GlueWire]]) loads it directly, which is exactly
    * how an Iceberg Glue catalog works (Glue stores only the pointer).
    */
  def tableMetadataJson(meta: TableMetaFx, schemas: Seq[SchemaFx],
      specs: Seq[SpecFx], snaps: Seq[SnapshotFx]): String = {
    val root = M.createObjectNode()
    renderMetadataInto(root, meta, schemas, specs, snaps)
    root.toPrettyString
  }

  private def renderMetadataInto(md: ObjectNode, meta: TableMetaFx,
      schemas: Seq[SchemaFx], specs: Seq[SpecFx],
      snaps: Seq[SnapshotFx]): Unit = {
    md.put("format-version", 2)
    md.put("table-uuid", f"00000000-0000-0000-0000-${
      math.abs((meta.namespace + "." + meta.name).hashCode).toLong}%012d")
    md.put("location", meta.location)
    md.put("last-updated-ms",
      if (snaps.isEmpty) 0L else snaps.map(_.ts_ms).max)
    md.put("current-schema-id", meta.current_schema_id)
    val schArr = md.putArray("schemas")
    schemas.sortBy(_.schema_id).foreach { s =>
      val so = schArr.addObject()
      so.put("type", "struct")
      so.put("schema-id", s.schema_id)
      val fs = so.putArray("fields")
      s.fields.foreach { f =>
        val fo = fs.addObject()
        fo.put("id", f.id)
        fo.put("name", f.name)
        fo.put("required", f.required)
        wireType(fo, "type", f.ftype)
        f.doc.foreach(fo.put("doc", _))
      }
    }
    val defSpec = specs.find(_.is_default).map(_.spec_id).getOrElse(0)
    md.put("default-spec-id", defSpec)
    val spArr = md.putArray("partition-specs")
    specs.sortBy(_.spec_id).foreach { sp =>
      val po = spArr.addObject()
      po.put("spec-id", sp.spec_id)
      val pf = po.putArray("fields")
      sp.fields.foreach { f =>
        val fo = pf.addObject()
        fo.put("source-id", f.source_id)
        fo.put("field-id", f.field_id)
        fo.put("name", f.name)
        fo.put("transform", f.transform)
      }
    }
    val props = md.putObject("properties")
    meta.properties.toSeq.sortBy(_._1).foreach { case (k, v) =>
      props.put(k, v)
    }
    meta.current_snapshot_id.foreach(md.put("current-snapshot-id", _))
    val snArr = md.putArray("snapshots")
    snaps.sortBy(_.snapshot_id).foreach { s =>
      val so = snArr.addObject()
      so.put("snapshot-id", s.snapshot_id)
      so.put("timestamp-ms", s.ts_ms)
      so.put("manifest-list", s.manifest_list)
      s.schema_id.foreach(so.put("schema-id", _))
      s.summary.foreach { m =>
        val sm = so.putObject("summary")
        m.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
      }
    }
    ()
  }

  /** the connection registry (reference `AppConfig`, `src/config.rs:10-54`):
    * `{"catalogs": [{"name": ..., "type": ..., "config": {...}}]}`
    */
  def catalogsJson(configs: Seq[ConfigFx]): String = {
    val root = M.createObjectNode()
    val arr = root.putArray("catalogs")
    configs.foreach { c =>
      val o = arr.addObject()
      o.put("name", c.name)
      o.put("type", c.catalog_type)
      val cfg = o.putObject("config")
      c.config.toSeq.sortBy(_._1).foreach { case (k, v) => cfg.put(k, v) }
    }
    root.toPrettyString
  }

  // ---- parse (the client side the engine runs) -------------------------

  def parseCatalogs(json: String): Seq[ConfigFx] =
    iter(M.readTree(json).path("catalogs")).map { c =>
      ConfigFx(c.path("name").asText, c.path("type").asText,
        iterFields(c.path("config"))
          .map { case (k, v) => k -> v.asText }.toMap)
    }

  /** `GET /v1/config` response (the spec's CatalogConfig): server-set
    * `defaults` (lower precedence than client config) and `overrides`
    * (higher precedence) — the one property the client needs is
    * `prefix`, which re-roots every other endpoint at
    * `/v1/{prefix}/...` (multi-tenant REST catalogs)
    */
  def configJson(defaults: Map[String, String],
      overrides: Map[String, String]): String = {
    val root = M.createObjectNode()
    val d = root.putObject("defaults")
    defaults.toSeq.sortBy(_._1).foreach { case (k, v) => d.put(k, v) }
    val o = root.putObject("overrides")
    overrides.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    root.toPrettyString
  }

  /** merged (defaults ++ overrides) map of a CatalogConfig response —
    * the two-level precedence collapses to one map here because the
    * client consults it only for server-owned keys (`prefix`)
    */
  def parseConfig(json: String): Map[String, String] = {
    val root = M.readTree(json)
    (iterFields(root.path("defaults")) ++ iterFields(root.path("overrides")))
      .map { case (k, v) => k -> v.asText }.toMap
  }

  /** the OAuth2 token-endpoint response's `access_token` (client
    * credentials flow, r18) — `None` when the field is absent/empty so
    * the client can fail with a message naming the endpoint.
    */
  def parseAccessToken(json: String): Option[String] = {
    val t = M.readTree(json).path("access_token")
    if (t.isMissingNode || t.isNull || t.asText.isEmpty) None
    else Some(t.asText)
  }

  /** the listing response's continuation token — `None` on the last
    * page (the spec's `next-page-token`; null and empty both mean the
    * listing is complete, matching reference-SDK behavior of iterating
    * to exhaustion, `/root/reference/src/catalog.rs:261-286`)
    */
  def parseNextPageToken(json: String): Option[String] = {
    val t = M.readTree(json).path("next-page-token")
    if (t.isMissingNode || t.isNull || t.asText.isEmpty) None
    else Some(t.asText)
  }

  def parseNamespaces(json: String): Seq[String] = {
    val arr = M.readTree(json).path("namespaces")
    iter(arr).map(levels => iter(levels).map(_.asText).mkString("."))
  }

  def parseTableIdents(json: String): Seq[(String, String)] = {
    iter(M.readTree(json).path("identifiers")).map { id =>
      (iter(id.path("namespace")).map(_.asText).mkString("."),
        id.path("name").asText)
    }
  }

  /** wire type node → the reference's rendered type string
    * (`src/data.rs:65-86`)
    */
  private def flatType(n: JsonNode): String =
    if (n.isTextual) n.asText
    else n.path("type").asText match {
      case "struct" => "struct"
      case "list" => s"list<${flatType(n.path("element"))}>"
      case "map" =>
        s"map<${flatType(n.path("key"))}, ${flatType(n.path("value"))}>"
      case other => other
    }

  /** LoadTableResponse → the normalized per-entity rows of [[Model]];
    * `is_current`/`is_default` derive from current-schema-id /
    * default-spec-id exactly as the reference adapter derives them
    * (`src/iceberg_adapter.rs:11-65`).
    */
  def parseLoadTable(catalog: String, ns: String, table: String,
      json: String): (TableMetaFx, Seq[SchemaFx], Seq[SpecFx],
      Seq[SnapshotFx]) =
    parseMetadataNode(catalog, ns, table, M.readTree(json).path("metadata"))

  /** standalone TableMetadata file → the same normalized rows (the Glue
    * client's load path; see [[tableMetadataJson]])
    */
  def parseTableMetadata(catalog: String, ns: String, table: String,
      json: String): (TableMetaFx, Seq[SchemaFx], Seq[SpecFx],
      Seq[SnapshotFx]) =
    parseMetadataNode(catalog, ns, table, M.readTree(json))

  private def parseMetadataNode(catalog: String, ns: String, table: String,
      md: JsonNode): (TableMetaFx, Seq[SchemaFx], Seq[SpecFx],
      Seq[SnapshotFx]) = {
    val curSchema = md.path("current-schema-id").asInt
    val curSnap =
      if (md.has("current-snapshot-id"))
        Some(md.path("current-snapshot-id").asLong)
      else None
    val props = {
      val p = md.path("properties")
      iterFields(p).map { case (k, v) => k -> v.asText }.toMap
    }
    val meta = TableMetaFx(catalog, ns, table, md.path("location").asText,
      curSnap, curSchema, props)
    val schemas = iter(md.path("schemas")).map { s =>
      val sid = s.path("schema-id").asInt
      SchemaFx(catalog, ns, table, sid, is_current = sid == curSchema,
        iter(s.path("fields")).map { f =>
          FieldFx(f.path("id").asInt, f.path("name").asText,
            f.path("required").asBoolean,
            if (f.has("doc")) Some(f.path("doc").asText) else None,
            flatType(f.path("type")))
        })
    }
    val defSpec = md.path("default-spec-id").asInt
    val specs = iter(md.path("partition-specs")).map { sp =>
      val sid = sp.path("spec-id").asInt
      SpecFx(catalog, ns, table, sid, is_default = sid == defSpec,
        iter(sp.path("fields")).map { f =>
          PartFieldFx(f.path("source-id").asInt, f.path("field-id").asInt,
            f.path("name").asText, f.path("transform").asText)
        })
    }
    val snaps = iter(md.path("snapshots")).map { s =>
      SnapshotFx(catalog, ns, table, s.path("snapshot-id").asLong,
        s.path("timestamp-ms").asLong, s.path("manifest-list").asText,
        if (s.has("schema-id")) Some(s.path("schema-id").asInt) else None,
        if (s.has("summary"))
          Some(iterFields(s.path("summary"))
            .map { case (k, v) => k -> v.asText }.toMap)
        else None)
    }
    (meta, schemas, specs, snaps)
  }

  private def iter(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    val it = n.elements()
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def iterFields(n: JsonNode): Seq[(String, JsonNode)] = {
    val b = Seq.newBuilder[(String, JsonNode)]
    val it = n.fields()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }
}
