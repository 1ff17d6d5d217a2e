package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** bigram_stats: in-row (top_bigram, top_n, dup_n), interpreted AND
  * codegen paths, pinned bit-identical to the grouped
  * explode → count → min_by/max/sum rollup it replaced in
  * TextOps.repetitionSignals (reconstructed verbatim as the model).
  */
class BigramStatsSpec extends SparkSpec {

  /** the EXACT former grouped rollup over (id, tk) rows */
  private def groupedModel(df: org.apache.spark.sql.DataFrame) = {
    val tk = col("tk")
    val nt = size(tk)
    val bg = when(nt >= 2, transform(sequence(lit(1), nt - 1), i =>
      concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
      .otherwise(array().cast("array<string>"))
    df.select(col("id"), explode(bg).as("bigram"))
      .groupBy(col("id"), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(
        min_by(col("bigram"),
          struct((-col("c")).as("nc"), col("bigram").as("bg")))
          .as("top_bigram"),
        max(col("c")).as("top_n"),
        sum(when(col("c") >= 2, col("c")).otherwise(lit(0L))).as("dup_n"))
  }

  test("matches the grouped rollup on ties, repeats, unicode, random docs") {
    BigramStats.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val vocab = Seq("a", "b", "c", "再", "naïve", "zz", "")
    val cases: Seq[Seq[String]] = Seq(
      Seq("a", "b", "a", "b", "a"),       // "a b" x2 vs "b a" x2: tie -> "a b"
      Seq("x", "x", "x", "x"),            // one bigram x3
      Seq("q", "w"),                      // single bigram, no dups
      Seq("再", "見", "再", "見")) ++
      (1 to 40).map(_ => Seq.fill(2 + rnd.nextInt(50))(
        vocab(rnd.nextInt(vocab.size))))
    val df = cases.zipWithIndex.map { case (xs, i) => (i, xs) }
      .toDF("id", "tk")
    val grouped = groupedModel(df).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val native = df.select($"id",
        call_function("bigram_stats", $"tk").as("bs")).collect()
      .map { r =>
        val bs = r.getStruct(1)
        r.getInt(0) -> ((bs.getString(0), bs.getLong(1), bs.getLong(2)))
      }.toMap
    assert(native == grouped)
  }

  test("under 2 tokens and null arrays give a null struct (the join miss)") {
    BigramStats.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
        (1, Some(Seq("solo"))),
        (2, Some(Seq.empty[String])),
        (3, None: Option[Seq[String]]))
      .toDF("id", "tk")
    val out = df.select($"id",
        call_function("bigram_stats", $"tk").as("bs")).collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1 -> true, 2 -> true, 3 -> true))
  }

  test("null tokens follow concat_ws skip semantics") {
    BigramStats.register(spark)
    val s = spark
    import s.implicits._
    // (a, null, a): bigrams "a" and "a" -> top "a" x2, dup 2 — exactly
    // what the grouped model computes through concat_ws
    val df = Seq((1, Seq(Some("a"), None, Some("a"))))
      .toDF("id", "tk")
    val grouped = groupedModel(df).head
    val bs = df.select(call_function("bigram_stats", $"tk").as("bs"))
      .head.getStruct(0)
    assert(bs.getString(0) == grouped.getString(1) &&
      bs.getLong(1) == grouped.getLong(2) &&
      bs.getLong(2) == grouped.getLong(3))
  }

  test("runs inside whole-stage codegen") {
    BigramStats.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, Seq("a", "b", "a", "b", i.toString)))
      .toDF("id", "tk")
    val q = df.repartition(2).select(call_function("bigram_stats", $"tk"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[bigramstats""".r.findFirstIn(plan).isDefined,
      plan)
  }
}
