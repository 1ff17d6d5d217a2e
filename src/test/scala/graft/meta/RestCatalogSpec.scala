package graft.meta

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The REST wire-format client path (S1/S2 minus transport) must
  * reproduce the parquet-fixture catalog EXACTLY: same listing (with
  * probe-derived classification), same normalized snapshots, same
  * schema/spec versions, same head objects — so swapping in an HTTP
  * transport changes nothing downstream.
  */
class RestCatalogSpec extends SparkSpec {

  private lazy val rest = RestPayloadCatalog.default
  private lazy val fix = FixtureCatalog.default

  // map-typed columns (summary/properties/config) stringify in
  // construction order — render them entry-sorted so equal maps compare equal
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

  test("listing matches, classification via the load-probe semantics") {
    assert(rows(rest.listing(spark)) == rows(fix.listing(spark)))
    // the unknown tables exist as identifiers but have no load payload —
    // classification is DERIVED, not copied
    val unknown = rest.listing(spark)
      .filter(org.apache.spark.sql.functions.col("table_type") === "unknown")
      .collect().map(_.getAs[String]("table_name")).toSet
    assert(unknown == Set("legacy_csv", "export_job"))
  }

  test("normalized snapshots are identical through the wire format") {
    assert(rows(rest.snapshots(spark)) == rows(fix.snapshots(spark)))
  }

  test("schema versions round-trip incl. nested type rendering and docs") {
    assert(rows(rest.schemaVersions(spark)) == rows(fix.schemaVersions(spark)))
  }

  test("partition specs round-trip incl. transforms and default flags") {
    assert(rows(rest.partitionSpecs(spark)) == rows(fix.partitionSpecs(spark)))
  }

  test("table heads and connection registry round-trip") {
    assert(rows(rest.tableMeta(spark)) == rows(fix.tableMeta(spark)))
    assert(rows(rest.appConfig(spark)) == rows(fix.appConfig(spark)))
  }

  test("multi-level namespaces enumerate via the parent walk (payload transport)") {
    // the r18 nested fixture: depth-3 hierarchy, an intermediate
    // namespace with children but no tables, a flat sibling, and one
    // unloadable leaf table — the walk must find all four tables with
    // dotted display namespaces and probe-classify the leaf unknown
    val nested = new RestPayloadCatalog(RestNestedFixtureGen.DefaultDir)
    val got = nested.listing(spark).collect().map(r =>
      Model.ListingFx(r.getAs[String]("catalog_name"),
        r.getAs[String]("catalog_type"), r.getAs[String]("namespace"),
        r.getAs[String]("table_name"), r.getAs[String]("table_type"))).toSet
    assert(got == RestNestedFixtureGen.expected.toSet)
  }

  test("wire payloads are re-parseable after a render round trip") {
    // render the parsed model back out and parse again — fixed point
    val key = ("c_rest", "sales", "orders_hot")
    val m = FixtureGen.tableMeta.find(t =>
      (t.catalog, t.namespace, t.name) == key).get
    val json = RestWire.loadTableJson(m,
      FixtureGen.schemas.filter(s => (s.catalog, s.namespace, s.name) == key),
      FixtureGen.specs.filter(s => (s.catalog, s.namespace, s.name) == key),
      FixtureGen.snapshots.filter(s => (s.catalog, s.namespace, s.name) == key))
    val (m2, sch2, sp2, sn2) =
      RestWire.parseLoadTable("c_rest", "sales", "orders_hot", json)
    assert(m2 == m)
    assert(sch2.toSet == FixtureGen.schemas
      .filter(s => (s.catalog, s.namespace, s.name) == key).toSet)
    assert(sp2.toSet == FixtureGen.specs
      .filter(s => (s.catalog, s.namespace, s.name) == key).toSet)
    assert(sn2.toSet == FixtureGen.snapshots
      .filter(s => (s.catalog, s.namespace, s.name) == key).toSet)
  }
}
