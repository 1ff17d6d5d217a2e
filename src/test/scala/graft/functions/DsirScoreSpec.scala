package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** dsir_terms: the fused DSIR gram→bucket→ratio→sorted-sum pass,
  * interpreted AND codegen paths, pinned bit-identical to the
  * transform/aggregate HOF composition it replaced in
  * TextOps.dsirScore (reconstructed verbatim as the parity model).
  */
class DsirScoreSpec extends SparkSpec {

  private val B = 64
  private val ratios: Array[Double] =
    Array.tabulate(B)(k => 0.25 + (k % 7) * 0.33)

  /** the EXACT former composition over a `tk` column */
  private def hofCols = {
    val tk = col("tk")
    val rLit = array(ratios.toSeq.map(lit): _*)
    val biArr = when(size(tk) >= 2,
      transform(sequence(lit(1), size(tk) - 1), i =>
        concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
      .otherwise(array().cast("array<string>"))
    val gramArr = concat(tk, biArr)
    val bucketOf = (g: org.apache.spark.sql.Column) =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"),
        lit(B.toLong))
    val terms = transform(gramArr,
      g => element_at(rLit, bucketOf(g).cast("int") + 1))
    val fold = aggregate(sort_array(terms), lit(0.0), (acc, x) => acc + x)
    (size(gramArr).cast("long"), fold)
  }

  test("matches the HOF fold bit-for-bit on random, unicode, and edge docs") {
    DsirScore.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = Seq("alpha", "beta", "gamma", "再", "naïve", "x", "", "𐍈")
    val cases: Seq[Seq[String]] = Seq(
      Seq.empty[String],
      Seq("solo"),
      Seq("a", "b"),
      Seq("", "", "")) ++
      (1 to 40).map(_ => Seq.fill(rnd.nextInt(80))(
        vocab(rnd.nextInt(vocab.size))))
    val df = cases.zipWithIndex.map { case (xs, i) => (i, xs) }
      .toDF("id", "tk")
    val (hn, hs) = hofCols
    val both = df.select($"id",
        call_function("dsir_terms", $"tk",
          array(ratios.toSeq.map(lit): _*)).as("ts"),
        hn.as("hn"), hs.as("hs")).collect()
    both.foreach { r =>
      val ts = r.getStruct(1)
      assert(ts.getLong(0) == r.getLong(2), s"n_grams doc ${r.getInt(0)}")
      // bit equality, not tolerance: the sorted fold is the determinism
      // contract
      assert(java.lang.Double.doubleToRawLongBits(ts.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"s doc ${r.getInt(0)}: native=${ts.getDouble(1)} hof=${r.getDouble(3)}")
    }
  }

  test("null token nulls the sum but not the gram count; null array is null") {
    DsirScore.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
        (1, Some(Seq(Some("a"), None, Some("c")))),
        (2, None: Option[Seq[Option[String]]]))
      .toDF("id", "tk")
    val out = df.select($"id",
        call_function("dsir_terms", $"tk",
          array(ratios.toSeq.map(lit): _*)).as("ts")).collect()
    val r1 = out.find(_.getInt(0) == 1).get
    assert(!r1.isNullAt(1) && r1.getStruct(1).getLong(0) == 5L &&
      r1.getStruct(1).isNullAt(1))
    assert(out.find(_.getInt(0) == 2).get.isNullAt(1))
  }

  test("runs inside whole-stage codegen") {
    DsirScore.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, Seq("a", "b", i.toString)))
      .toDF("id", "tk")
    val q = df.repartition(2).select(call_function("dsir_terms", $"tk",
      array(ratios.toSeq.map(lit): _*)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[dsirscore""".r.findFirstIn(plan).isDefined,
      plan)
  }
}
