package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** dup_bigram_count: Σ{c : c ≥ 2} over adjacent-bigram counts of a
  * token array, interpreted AND codegen paths, against an independent
  * groupBy-count Scala model.
  */
class DupBigramCountSpec extends SparkSpec {

  private def model(toks: Seq[String]): Long =
    toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size.toLong).filter(_ >= 2).sum

  test("matches the groupBy-count model on random sorted arrays") {
    DupBigramCount.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Seq.empty[String],
      Seq("a"),
      Seq("a", "a"),
      Seq("a", "a", "a", "b", "b", "c"),
      Seq("b", "a", "b", "c", "a", "b"), // UNSORTED: sorts internally
      Seq("x", "y", "z")) ++
      (1 to 20).map(_ => Seq.fill(rnd.nextInt(30))(
        rnd.nextInt(5).toString))
    val df = cases.zipWithIndex.map { case (xs, i) => (i, xs) }
      .toDF("id", "arr")
    val out = df.select($"id",
        call_function("dup_bigram_count", $"arr").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (xs, i) =>
      assert(out(i) == model(xs), s"case $i: $xs")
    }
    // the expression must run inside whole-stage codegen (no fallback);
    // repartition forces a real stage (a LocalTableScan short-circuits)
    // and the collect() materializes AQE's final plan
    val q = df.repartition(2)
      .select(call_function("dup_bigram_count", $"arr"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen marker in the abbreviated plan
    // string: the projection computing dupbigramcount must carry it
    assert("""\*\(\d+\) Project \[dupbigramcount""".r
        .findFirstIn(plan).isDefined, plan)
  }

  test("null array and null element yield null") {
    DupBigramCount.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1, Some(Seq(Some("a"), None, Some("a")))),
        (2, None: Option[Seq[Option[String]]]))
      .toDF("id", "arr")
    val out = df.select($"id",
        call_function("dup_bigram_count", $"arr").as("n")).collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1 -> true, 2 -> true))
  }
}
