package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Model._

/** seeded property coverage for the REST wire format: render→parse must
  * be a FIXED POINT for arbitrary catalog populations, not just the
  * golden fixtures — a live server hands the client metadata shaped by
  * someone else's writer (same deterministic Gen-pumping driver as
  * CodecPropsSpec; scalatestplus is not on the offline classpath).
  */
class RestWirePropsSpec extends AnyFunSuite {

  def forAllSeeded[T](gen: Gen[T], n: Int = 150)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(7301L + i)).foreach(check)
    }

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))

  private val prim: Gen[String] = Gen.oneOf("int", "long", "string",
    "double", "boolean", "timestamp", "decimal(10, 2)")

  /** the reference's rendered type strings, incl. the nested renderings */
  private val ftype: Gen[String] = Gen.oneOf(prim, Gen.const("struct"),
    prim.map(p => s"list<$p>"), Gen.const("map<string, int>"))

  private val smallMap: Gen[Map[String, String]] = Gen.choose(0, 4)
    .flatMap(n => Gen.mapOfN(n, Gen.zip(ident, ident)))

  private val fieldGen: Gen[FieldFx] = for {
    id <- Gen.choose(1, 999)
    name <- ident
    req <- Gen.oneOf(true, false)
    doc <- Gen.option(ident)
    t <- ftype
  } yield FieldFx(id, name, req, doc, t)

  private def population(cat: String, ns: String, t: String) = for {
    nSchemas <- Gen.choose(1, 4)
    schemaFields <- Gen.listOfN(nSchemas, Gen.nonEmptyListOf(fieldGen))
    curSchema <- Gen.choose(0, nSchemas - 1)
    nSpecs <- Gen.choose(1, 3)
    specFields <- Gen.listOfN(nSpecs, Gen.listOf(for {
      src <- Gen.choose(1, 999); fid <- Gen.choose(1000, 1999)
      nm <- ident
      tr <- Gen.oneOf("identity", "bucket[16]", "truncate[4]", "year",
        "month", "day", "hour", "void")
    } yield PartFieldFx(src, fid, nm, tr)))
    defSpec <- Gen.choose(0, nSpecs - 1)
    nSnaps <- Gen.choose(0, 5)
    snaps <- Gen.sequence[Seq[SnapshotFx], SnapshotFx](
      (0 until nSnaps).map { i =>
        for {
          ts <- Gen.choose(0L, 4102444800000L)
          ml <- ident
          sid <- Gen.option(Gen.choose(0, nSchemas - 1))
          sm <- Gen.option(smallMap)
        } yield SnapshotFx(cat, ns, t, 100L + i, ts, ml, sid, sm)
      })
    curSnap <- if (nSnaps == 0) Gen.const(None)
      else Gen.option(Gen.choose(0, nSnaps - 1).map(i => 100L + i))
    props <- smallMap
    loc <- ident
  } yield {
    val schemas = schemaFields.zipWithIndex.map { case (fs, i) =>
      SchemaFx(cat, ns, t, i, is_current = i == curSchema, fs)
    }
    val specs = specFields.zipWithIndex.map { case (fs, i) =>
      SpecFx(cat, ns, t, i, is_default = i == defSpec, fs)
    }
    val meta = TableMetaFx(cat, ns, t, s"s3://wh/$loc", curSnap,
      curSchema, props)
    (meta, schemas, specs, snaps)
  }

  test("LoadTableResponse render→parse is a fixed point for arbitrary populations") {
    forAllSeeded(population("c", "ns", "t")) {
      case (meta, schemas, specs, snaps) =>
        val json = RestWire.loadTableJson(meta, schemas, specs, snaps)
        val (m2, sch2, sp2, sn2) = RestWire.parseLoadTable("c", "ns", "t", json)
        assert(m2 == meta)
        assert(sch2.toSet == schemas.toSet)
        assert(sp2.toSet == specs.toSet)
        assert(sn2.toSet == snaps.toSet)
    }
  }

  test("namespaces / identifiers / registry docs round-trip") {
    val gen = for {
      nss <- Gen.listOf(ident).map(_.distinct)
      ns <- ident
      tables <- Gen.listOf(ident).map(_.distinct)
      cfgs <- Gen.listOf(for {
        n <- ident; t <- Gen.oneOf("rest", "glue"); c <- smallMap
      } yield ConfigFx(n, t, c))
    } yield (nss, ns, tables, cfgs)
    forAllSeeded(gen) { case (nss, ns, tables, cfgs) =>
      assert(RestWire.parseNamespaces(RestWire.namespacesJson(nss)) == nss)
      assert(RestWire.parseTableIdents(RestWire.tableIdentsJson(ns, tables))
        == tables.map(t => (ns, t)))
      assert(RestWire.parseCatalogs(RestWire.catalogsJson(cfgs)) == cfgs)
    }
  }
}
