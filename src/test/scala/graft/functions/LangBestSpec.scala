package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** lang_best: the stopword-vote language winner, interpreted AND codegen
  * paths, pinned bit-identical to the five-filter strict-`>` fold it
  * replaced in the x26/st13 quality gate.
  */
class LangBestSpec extends SparkSpec {

  /** the EXACT former composition: five `filter(tk, array_contains)`
    * hit counts folded in ascending language order with strict `>` —
    * the parity model for the native expression.
    */
  private def foldExpr = {
    val tk = col("arr")
    LangBest.LangWords.foldLeft(
      struct(lit("unknown").as("l"), lit(0).as("h"))) {
      case (acc, (l, ws)) =>
        val h = size(filter(tk, t => array_contains(typedLit(ws), t)))
        when(h > acc.getField("h"),
          struct(lit(l).as("l"), h.as("h"))).otherwise(acc)
    }.getField("l")
  }

  test("matches the filter-fold on ties, overlaps, unicode, and random docs") {
    LangBest.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = LangBest.LangWords.flatMap(_._2) ++
      Seq("qqq", "zzz", "la", "de", "un", "𐍈wulfila", "", " ")
    val cases: Seq[Seq[String]] = Seq(
      Seq.empty[String],
      Seq("qqq", "zzz"),                       // zero hits -> unknown
      Seq("the", "der"),                       // 1-1 tie -> de (ascending)
      Seq("la", "de", "un"),                   // es/fr full overlap tie -> es
      Seq("le", "la", "de", "the", "a", "of"), // 3 fr vs 3 en -> en < fr
      Seq("的", "是", "了", "在"),               // zh multi-byte
      Seq("the", "the", "the", "el"),          // repeats count per element
      Seq("𐍈wulfila", "the")) ++               // supplementary-plane noise
      (1 to 40).map(_ =>
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    val df = cases.zipWithIndex.map { case (xs, i) => (i, xs) }
      .toDF("id", "arr")
    val both = df.select($"id",
        call_function("lang_best", $"arr").as("native"),
        foldExpr.as("fold")).collect()
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"case ${r.getInt(0)}: native=${r.getString(1)} fold=${r.getString(2)}")
    }
  }

  test("runs inside whole-stage codegen") {
    LangBest.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, Seq("the", "der", i.toString)))
      .toDF("id", "arr")
    val q = df.repartition(2).select(call_function("lang_best", $"arr"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[langbest""".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("null array yields null; null elements are skipped like the fold") {
    LangBest.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
        (1, Some(Seq(Some("the"), None, Some("the")))),
        (2, None: Option[Seq[Option[String]]]),
        (3, Some(Seq(None: Option[String]))))
      .toDF("id", "arr")
    val out = df.select($"id",
        call_function("lang_best", $"arr").as("l")).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    // null elements skipped (array_contains(ws, null) -> null -> filter
    // drops): the "the" hits still win; all-null array -> zero hits
    assert(out == Map(1 -> "en", 2 -> null, 3 -> "unknown"))
  }
}
