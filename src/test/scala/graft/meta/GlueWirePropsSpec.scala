package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import GlueWire.GlueTableFx

/** seeded property coverage for the Glue wire format (the
  * RestWirePropsSpec discipline): GetDatabases/GetTables render→parse
  * must be a FIXED POINT for arbitrary populations — a live catalog
  * hands the client table entries shaped by someone else's writer —
  * and the Iceberg-pointer convention must be decided by the
  * parameters alone.
  */
class GlueWirePropsSpec extends AnyFunSuite {

  def forAllSeeded[T](gen: Gen[T], n: Int = 150)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(9103L + i)).foreach(check)
    }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))

  // parameter values with the characters a real Glue writer emits:
  // URIs, slashes, dots, dashes, spaces
  private val pval: Gen[String] = Gen.oneOf(
    ident,
    ident.map(s => s"s3://bucket/$s/metadata/v1.metadata.json"),
    ident.map(s => s"some value with spaces $s"),
    Gen.const(""))

  private val params: Gen[Map[String, String]] = Gen.choose(0, 5)
    .flatMap(n => Gen.mapOfN(n, Gen.zip(ident, pval)))

  private val tableGen: Gen[GlueTableFx] = for {
    db <- ident
    name <- ident
    tt <- Gen.oneOf("EXTERNAL_TABLE", "MANAGED_TABLE", "VIRTUAL_VIEW")
    ps <- params
  } yield GlueTableFx(db, name, tt, ps)

  test("GetDatabases render→parse is a fixed point") {
    forAllSeeded(Gen.listOf(ident)) { dbs =>
      assert(GlueWire.parseDatabases(GlueWire.getDatabasesJson(dbs)) == dbs)
    }
  }

  test("GetTables render→parse is a fixed point for arbitrary entries") {
    forAllSeeded(Gen.listOf(tableGen)) { ts =>
      assert(GlueWire.parseTables(GlueWire.getTablesJson(ts)) == ts)
    }
  }

  test("the Iceberg-pointer convention is a pure function of Parameters") {
    forAllSeeded(tableGen) { t =>
      val expected = t.parameters.get("table_type")
        .exists(_.equalsIgnoreCase("iceberg"))
      assert(t.isIcebergPointer == expected)
      assert(t.metadataLocation == t.parameters.get("metadata_location"))
    }
  }

  test("locationKey is filesystem-safe and injective on the fixture shapes") {
    forAllSeeded(Gen.listOfN(8,
        ident.map(s => s"s3://warehouse/$s/metadata/v1.metadata.json"))) {
      locs =>
        val keys = locs.map(GlueWire.locationKey)
        keys.foreach(k =>
          assert(k.matches("[A-Za-z0-9._-]+"), s"unsafe key $k"))
        assert(keys.distinct.size == locs.distinct.size)
    }
  }
}
