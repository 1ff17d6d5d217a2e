package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.meta.{Model, Normalize}
import MetaOps.SnapshotFilterParams

class FilterSpec extends SparkSpec {

  private def snaps(rows: Seq[Model.SnapshotFx]) = {
    val s = spark
    import s.implicits._
    Normalize.snapshots(rows.toDS().toDF())
  }

  private def ids(rows: Seq[Model.SnapshotFx], p: SnapshotFilterParams): Set[Long] =
    snaps(rows).filter(MetaOps.snapshotFilter(p))
      .select("snapshot_id").collect().map(_.getLong(0)).toSet

  private def snap(id: Long, ts: Long, sum: Option[Map[String, String]]) =
    Model.SnapshotFx("c", "n", "t", id, ts, "m", Some(1), sum)

  test("F2: unparseable or absent files-added PASSES the range filter") {
    val rows = Seq(
      snap(1, 0, Some(Map("operation" -> "append", "added-data-files" -> "50"))),
      snap(2, 0, Some(Map("operation" -> "append", "added-data-files" -> "N/A"))),
      snap(3, 0, Some(Map("operation" -> "append"))),
      snap(4, 0, None), // null summary → op unknown; use op filter off
      snap(5, 0, Some(Map("operation" -> "append", "added-data-files" -> "500"))))
    val p = SnapshotFilterParams(operationTypes = Seq.empty,
      filesAddedMin = Some(10), filesAddedMax = Some(100))
    assert(ids(rows, p) == Set(1L, 2L, 3L, 4L)) // 5 fails (500 > 100)
  }

  test("F3: records range with pass-through, min and max independent") {
    val rows = Seq(
      snap(1, 0, Some(Map("added-records" -> "5"))),
      snap(2, 0, Some(Map("added-records" -> "abc"))),
      snap(3, 0, Some(Map("added-records" -> "50"))))
    val p = SnapshotFilterParams(operationTypes = Seq.empty,
      recordsAddedMin = Some(10))
    assert(ids(rows, p) == Set(2L, 3L))
  }

  test("F4: inclusive day bounds; malformed date disables the bound") {
    val d0 = java.time.LocalDate.parse("2025-06-01").toEpochDay * 86400000L
    val rows = Seq(
      snap(1, d0 - 1, None), // 2025-05-31 23:59:59.999
      snap(2, d0, None), // exactly start of day
      snap(3, d0 + 86399000L, None), // 23:59:59 same day
      snap(4, d0 + 86400000L, None)) // next day 00:00
    val p = SnapshotFilterParams(operationTypes = Seq.empty,
      dateStart = Some("2025-06-01"), dateEnd = Some("2025-06-01"))
    assert(ids(rows, p) == Set(2L, 3L))
    val malformed = SnapshotFilterParams(operationTypes = Seq.empty,
      dateStart = Some("junk-date"), dateEnd = Some("2025-06-01"))
    assert(ids(rows, malformed) == Set(1L, 2L, 3L))
  }

  test("F1: inferred op must be in the selected set; unknown excluded by default") {
    val rows = Seq(
      snap(1, 0, Some(Map("operation" -> "append"))),
      snap(2, 0, Some(Map("operation" -> "rewrite-data-files"))),
      snap(3, 0, None)) // unknown
    assert(ids(rows, SnapshotFilterParams()) == Set(1L))
    assert(ids(rows, SnapshotFilterParams(operationTypes = Seq.empty)) ==
      Set(1L, 2L, 3L))
  }

  test("property: a row with unparseable numerics passes ANY range bounds") {
    val gen = for {
      mn <- Gen.option(Gen.choose(0L, 1000L))
      mx <- Gen.option(Gen.choose(0L, 1000L))
      junk <- Gen.oneOf("N/A", "abc", "", "1.5", "-3", "0x10")
    } yield (mn, mx, junk)
    val rows = (0 until 60).flatMap { i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)).map {
        case (mn, mx, junk) => (mn, mx, junk)
      }
    }
    rows.foreach { case (mn, mx, junk) =>
      val r = Seq(snap(1, 0,
        Some(Map("added-data-files" -> junk, "added-records" -> junk))))
      val p = SnapshotFilterParams(operationTypes = Seq.empty,
        filesAddedMin = mn, filesAddedMax = mx,
        recordsAddedMin = mn, recordsAddedMax = mx)
      assert(ids(r, p) == Set(1L), s"junk '$junk' must pass bounds $mn..$mx")
    }
  }
}

class FilterAlgebraSpec extends graft.SparkSpec {
  test("snapshot filter is idempotent and monotone in its bounds") {
    val cat = graft.meta.FixtureCatalog.default
    val snaps = cat.snapshots(spark)
    val p = MetaOps.SnapshotFilterParams(
      filesAddedMin = Some(10), recordsAddedMax = Some(6000))
    val once = snaps.filter(MetaOps.snapshotFilter(p))
    assert(once.filter(MetaOps.snapshotFilter(p)).count() == once.count())
    val looser = p.copy(filesAddedMin = Some(5))
    assert(snaps.filter(MetaOps.snapshotFilter(looser)).count() >= once.count())
    val all = snaps.filter(MetaOps.snapshotFilter(
      MetaOps.SnapshotFilterParams(operationTypes = Seq.empty))).count()
    assert(all == snaps.count()) // no active bounds ⇒ pass-through
  }
}
