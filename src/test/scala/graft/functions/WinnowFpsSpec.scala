package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** winnow_fps: in-row winnowing fingerprints, interpreted AND codegen
  * paths, pinned set-identical to the explode + rowsBetween-window
  * formulation it replaced (reconstructed verbatim as the model).
  */
class WinnowFpsSpec extends SparkSpec {

  private val (k, w) = (5, 16)

  /** the EXACT former composition over (id, text) rows */
  private def oldModel(df: org.apache.spark.sql.DataFrame) = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    df.filter(expr(s"char_length(text) >= $k"))
      .select(col("id"),
        expr(s"char_length(text) - ${k - 1}").as("n"), col("text"))
      .select(col("id"), col("n"),
        explode(sequence(lit(1), col("n"))).as("pos"), col("text"))
      .select(col("id"), col("n"), col("pos"),
        conv(substring(md5(expr(s"substr(text, pos, $k)")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .withColumn("wmin", min(col("h")).over(win))
      .filter(col("pos") <= col("n") - (w - 1) ||
        (col("n") < w && col("pos") === 1))
      .select(col("id"), col("wmin").as("fp"))
      .distinct()
  }

  test("matches the window formulation on random, unicode, and short docs") {
    WinnowFps.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val alpha = "abcde 再見𐍈"
    val texts = Seq(
      "",                      // below k chars -> no rows
      "abcd",                  // k-1 chars -> no rows
      "abcde",                 // exactly one gram, one window
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaa", // repeat-heavy: distinct collapses
      "再見 𐍈 naïve text with unicode grams") ++
      (1 to 30).map(_ => Seq.fill(3 + rnd.nextInt(120))(
        alpha(rnd.nextInt(alpha.length))).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
    val old = oldModel(df).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val native = df.select(col("id"),
        explode(call_function("winnow_fps", col("text"),
          lit(k), lit(w))).as("fp")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(native == old)
    assert(native.nonEmpty)
  }

  test("null text yields no rows after explode") {
    WinnowFps.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq((1, None: Option[String]), (2, Some("abcdefghij")))
      .toDF("id", "text")
    val out = df.select(col("id"),
        explode(call_function("winnow_fps", col("text"),
          lit(k), lit(w))).as("fp")).collect()
    assert(out.forall(_.getInt(0) == 2) && out.nonEmpty)
  }

  test("runs inside whole-stage codegen") {
    WinnowFps.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, s"document number $i with text"))
      .toDF("id", "text")
    val q = df.repartition(2).select(call_function("winnow_fps",
      col("text"), lit(k), lit(w)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[winnowfps""".r.findFirstIn(plan).isDefined,
      plan)
  }
}
