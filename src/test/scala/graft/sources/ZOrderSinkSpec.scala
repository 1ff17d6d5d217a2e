package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** the z-ordered layout contract: after writeZOrdered(a, b), per-file
  * min/max ranges stay tight on BOTH columns, so a range predicate on
  * EITHER prunes files — the property a leading-column sort cannot give
  * the trailing column.
  */
class ZOrderSinkSpec extends SparkSpec {

  private val NFiles = 8

  /** per-file [min,max] of `c`, read back via input_file_name */
  private def fileRanges(path: String, c: String): Seq[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSeq

  /** fraction of files whose [min,max] overlaps a `widthPct`-wide window
    * centered at the 25% point of the column's global range — what a
    * scan with that predicate reads. Off-center deliberately: a window
    * astride the exact midpoint crosses the top-level z-split and
    * overlaps everything by construction, which measures the box
    * placement, not the layout.
    */
  private def overlapFrac(ranges: Seq[(Long, Long)], widthPct: Double): Double = {
    val gLo = ranges.map(_._1).min
    val gHi = ranges.map(_._2).max
    val c = gLo + (gHi - gLo) / 4
    val half = ((gHi - gLo) * widthPct / 2).toLong
    val (qLo, qHi) = (c - half, c + half)
    ranges.count { case (lo, hi) => hi >= qLo && lo <= qHi }.toDouble /
      ranges.size
  }

  // a 4096-point grid where BOTH dimensions matter and neither is
  // correlated with the other
  private def grid: DataFrame = {
    val s = spark
    import s.implicits._
    val n = 64
    (0 until n * n).map { i =>
      (i.toLong, (i % n).toLong, (i / n).toLong)
    }.toDF("id", "x", "y").repartition(16)
  }

  test("z-ordered files prune on BOTH dimensions; a linear sort only on one") {
    val zDir = Files.createTempDirectory("zorder").toString
    val lDir = Files.createTempDirectory("linear").toString
    Sinks.writeZOrdered(grid, "x", "y", zDir, NFiles)
    // the contrast layout: lexicographic sort on x only
    grid.repartitionByRange(NFiles, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(lDir)

    val q = 0.2 // a 20%-wide range predicate around the middle
    val zx = overlapFrac(fileRanges(zDir, "x"), q)
    val zy = overlapFrac(fileRanges(zDir, "y"), q)
    val lx = overlapFrac(fileRanges(lDir, "x"), q)
    val ly = overlapFrac(fileRanges(lDir, "y"), q)
    // linear layout: perfect on the leading column, useless on the other
    assert(lx <= 0.5, s"leading-column pruning should work, got $lx")
    assert(ly == 1.0, s"trailing column should NOT prune, got $ly")
    // z-order: BOTH dimensions prune (each file covers a compact z-box)
    assert(zx <= 0.75, s"z-layout should prune on x, got $zx")
    assert(zy <= 0.75, s"z-layout should prune on y, got $zy")
    assert(zx + zy < lx + ly,
      "two-sided pruning must beat the linear layout in aggregate")
  }

  test("writeZOrdered preserves rows exactly and drops the helper column") {
    val dir = Files.createTempDirectory("zorder_rt").toString
    Sinks.writeZOrdered(grid, "x", "y", dir, NFiles)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == Seq("id", "x", "y"))
    assert(back.count() == 4096L)
    assert(back.select(sum(col("id"))).head().getLong(0) ==
      (0L until 4096L).sum)
  }
}
