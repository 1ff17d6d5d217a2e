package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** the Morton code must match an independent bit-by-bit reference for
  * arbitrary inputs, ignore bits ≥ 31, and order point boxes the way a
  * z-curve promises; the SQL surface goes through the registered native
  * expression.
  */
class ZOrderSpec extends SparkSpec {

  /** independent oracle: explicit per-bit placement */
  private def slowInterleave(a: Long, b: Long): Long =
    (0 until 31).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  def forAllSeeded[T](gen: Gen[T], n: Int = 300)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(4211L + i)).foreach(check)
    }

  test("known vectors") {
    assert(ZOrderBits.interleave31(0L, 0L) == 0L)
    assert(ZOrderBits.interleave31(1L, 0L) == 1L)
    assert(ZOrderBits.interleave31(0L, 1L) == 2L)
    assert(ZOrderBits.interleave31(3L, 5L) == 39L)
    assert(ZOrderBits.interleave31(0x7FFFFFFFL, 0x7FFFFFFFL) ==
      0x3FFFFFFFFFFFFFFFL)
  }

  test("matches the bit-by-bit reference for arbitrary longs, stays non-negative") {
    val gen = Gen.zip(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue))
    forAllSeeded(gen) { case (a, b) =>
      val z = ZOrderBits.interleave31(a, b)
      assert(z == slowInterleave(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL))
      assert(z >= 0L, "sign bit must never be set")
      // only the low 31 bits of each input participate
      assert(z == ZOrderBits.interleave31(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL))
    }
  }

  test("a box's corners bound its interior codes (the pruning property)") {
    // for any power-of-two-aligned box, the code of every interior point
    // lies between the codes of the box's min and max corners — the
    // property file-level min/max pruning relies on
    val gen = for {
      shift <- Gen.choose(0, 24)
      ax <- Gen.choose(0L, (1L << (30 - shift)) - 1)
      by <- Gen.choose(0L, (1L << (30 - shift)) - 1)
      dx <- Gen.choose(0L, (1L << shift) - 1)
      dy <- Gen.choose(0L, (1L << shift) - 1)
    } yield (ax << shift, by << shift, dx, dy, (1L << shift) - 1)
    forAllSeeded(gen) { case (x0, y0, dx, dy, span) =>
      val lo = ZOrderBits.interleave31(x0, y0)
      val hi = ZOrderBits.interleave31(x0 + span, y0 + span)
      val z = ZOrderBits.interleave31(x0 + dx, y0 + dy)
      assert(lo <= z && z <= hi)
    }
  }

  test("the registered SQL expression computes the same code") {
    val row = spark.sql(
      "SELECT zorder2(3, 5) AS a, zorder2(2147483647L, 0) AS b").head()
    assert(row.getLong(0) == 39L)
    assert(row.getLong(1) == 0x1555555555555555L)
  }
}
