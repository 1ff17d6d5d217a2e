package graft

import java.nio.file.{Files, Paths}

/** Per-round benchmark main.
  *
  * Fixes from round-1 verdict:
  *   - builds the session via [[graft.core.GraftSession]] (events' nanos
  *     timestamps + UTC come from there, not re-derived here);
  *   - the action is a `noop`-format write, so Catalyst cannot prune the
  *     projections/windows the way `.count()` allowed;
  *   - every query gets one warm-up run + 3 timed runs, reporting the
  *     median (cold-start no longer lands on whichever query runs first);
  *   - failures are reported per-query (`"failed"` list + null-free
  *     timings) instead of being swallowed as fake timings, and the
  *     process exits nonzero if anything failed;
  *   - the JSON line is written to `bench_out.json` AND printed on plain
  *     stdout (build.sbt sets `run / outputStrategy := StdoutOutput` so
  *     sbt does not decorate it into unparsability).
  *
  * Fixture-backed metadata queries (m*) run on constant-size golden
  * fixtures, so they are excluded from the scale-factor bench; everything
  * that reads the sf tables (relational q*, LLM x*, streaming st*) is in.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // optional regex filter for local experiments: SPARK_GRAFT_ONLY=q01|q25
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val benched = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => name.startsWith("m") }
      .filter { case (name, _) =>
        only.forall(_.findFirstIn(name).isDefined) }
      .sortBy(_._1)

    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.ListBuffer[(String, String)]()
    benched.foreach { case (name, fn) =>
      try {
        runOnce(fn) // warm-up: JIT + parquet footer cache + codegen cache
        val runs = Seq.fill(3)(runOnce(fn)).sorted
        timings(name) = runs(1) // median of 3
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          failed += name -> msg.linesIterator.take(1).mkString.take(200)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val fails = failed.map { case (k, m) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fails,"n_ok":${timings.size},"n_failed":${failed.size},"sf":${jstr(sfDir)}}"""

    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    println(json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
