package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.TextOps

/** token_weight_sum: (Σ w(token), vocabulary hits) over a token array
  * against a foldable weight map — interpreted AND codegen paths,
  * against both a Scala model and the interpreted `aggregate`-fold
  * composition it replaced in x66.
  */
class TokenWeightSumSpec extends SparkSpec {

  private val weights = TextOps.ClassifierWeights.toMap

  private def model(toks: Seq[String]): (Long, Long) =
    toks.foldLeft((0L, 0L)) { case ((s, h), t) =>
      weights.get(t) match {
        case Some(w) => (s + w, h + 1)
        case None => (s, h)
      }
    }

  test("matches the Scala model and the aggregate-fold composition") {
    TokenWeightSum.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = weights.keys.toIndexedSeq ++ Seq("nope", "zz", "")
    val cases = Seq(
      Seq.empty[String],
      Seq("fast"),
      Seq("slow", "slow", "the"),
      Seq("unknown", "words", "only")) ++
      (1 to 20).map(_ => Seq.fill(rnd.nextInt(40))(
        vocab(rnd.nextInt(vocab.size))))
    val df = cases.zipWithIndex.map { case (xs, i) => (i, xs) }
      .toDF("id", "arr")
    val wmap = typedLit(weights)
    val out = df.select($"id",
        call_function("token_weight_sum", $"arr", wmap).as("f")).collect()
      .map(r => r.getInt(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))).toMap
    cases.zipWithIndex.foreach { case (xs, i) =>
      assert(out(i) == model(xs), s"case $i: $xs")
    }
    // identity to the interpreted fold the expression replaced
    val acc0 = struct(lit(0L).as("s"), lit(0L).as("h"))
    val folded = df.select($"id", aggregate($"arr", acc0, (acc, t) =>
        struct(
          (acc.getField("s") + coalesce(element_at(wmap, t), lit(0L)))
            .as("s"),
          (acc.getField("h") +
            when(element_at(wmap, t).isNotNull, 1L).otherwise(0L))
            .as("h"))).as("f")).collect()
      .map(r => r.getInt(0) ->
        ((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))).toMap
    assert(folded == out)
    // must run inside whole-stage codegen (no interpreted fallback)
    val q = df.repartition(2)
      .select(call_function("token_weight_sum", $"arr", wmap))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[tokenweightsum""".r
        .findFirstIn(plan).isDefined, plan)
  }

  test("null array and null element yield null") {
    TokenWeightSum.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1, Some(Seq(Some("fast"), None))),
        (2, None: Option[Seq[Option[String]]]))
      .toDF("id", "arr")
    val out = df.select($"id",
        call_function("token_weight_sum", $"arr",
          typedLit(weights)).as("f")).collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1 -> true, 2 -> true))
  }
}
