package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** hyperplane_buckets: all nBands LSH bucket strings in one native
  * pass, interpreted AND codegen paths, pinned bit-identical to the
  * aggregate(zip_with) HOF composition it replaced
  * ([[graft.llm.Similarity.bandBucket]], kept as the parity model).
  */
class HyperplaneBucketsSpec extends SparkSpec {

  private val (nBands, bits, dim) = (4, 16, 8)

  /** the EXACT former composition: per band, concat over bitsPerBand
    * interpreted hyperplane-sign projections.
    */
  private def foldBuckets = {
    val planes = graft.llm.Similarity.hyperplanes(nBands, bits, dim)
    array(planes.map(ps =>
      graft.llm.Similarity.bandBucket(col("v"), ps)): _*)
  }

  test("matches the HOF composition on random, NaN, and boundary vectors") {
    HyperplaneBuckets.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val cases: Seq[Seq[Double]] = Seq(
      Seq.fill(dim)(0.0),                       // proj 0.0 -> '1' (>= 0)
      Seq.fill(dim)(1.0),
      Seq.fill(dim)(-1.0),
      Seq(Double.NaN) ++ Seq.fill(dim - 1)(1.0), // NaN -> '0' bits
      Seq.fill(dim)(Double.MinPositiveValue)) ++
      (1 to 40).map(_ => Seq.fill(dim)(rnd.nextGaussian()))
    val df = cases.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("id", "v")
    val both = df.select($"id",
        call_function("hyperplane_buckets", $"v",
          lit(nBands), lit(bits), lit(dim)).as("native"),
        foldBuckets.as("fold")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"case ${r.getInt(0)}")
    }
  }

  test("null element and length mismatch give the all-zero buckets the fold gave") {
    HyperplaneBuckets.register(spark)
    val s = spark
    import s.implicits._
    val zero = Seq.fill(nBands)("0" * bits)
    val df = Seq(
        (1, Some(Seq[Option[Double]](Some(1.0), None) ++
          Seq.fill(dim - 2)(Some(1.0)))),         // null element
        (2, Some(Seq.fill(dim - 1)(Some(1.0)): Seq[Option[Double]])), // short
        (3, Some(Seq.fill(dim + 3)(Some(1.0)): Seq[Option[Double]])), // long
        (4, None: Option[Seq[Option[Double]]]))   // null array -> null
      .toDF("id", "v")
    val out = df.select($"id",
        call_function("hyperplane_buckets", $"v",
          lit(nBands), lit(bits), lit(dim)).as("b")).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(out(1) == zero && out(2) == zero && out(3) == zero &&
      out(4) == null)
  }

  test("runs inside whole-stage codegen") {
    HyperplaneBuckets.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, Seq.fill(dim)(i.toDouble)))
      .toDF("id", "v")
    val q = df.repartition(2).select(call_function("hyperplane_buckets",
      $"v", lit(nBands), lit(bits), lit(dim)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[hyperplanebuckets""".r
      .findFirstIn(plan).isDefined, plan)
  }
}
