package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query stage/job census at bench scale (r16 verdict task 3): the
  * canonical close is now almost entirely per-stage scheduling floor
  * over ~130 sub-second queries, and the one honest lever left is
  * STRUCTURAL — fewer stages per query. This main measures, for one
  * warm noop-sink run of every batch query, the number of Spark jobs,
  * distinct stages, and tasks it schedules plus its wall — the data
  * that either names the queries carrying an avoidable exchange
  * (3+-stage sub-second entries) or shows the class is already at the
  * 1–2-stage floor and the residual is irreducible scheduling
  * granularity. Counting uses the public `statusTracker` keyed by a
  * per-query job group (no listener races, no private APIs).
  *
  * Usage: run_main.sh graft.StageCensus [stagedDir]
  */
object StageCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      "/tmp/graft_bench_staged/_root_testdata_sf0.1_p2")
    val spark = core.GraftSession.builder("graft-stagecensus", "32")
      .config("spark.driver.maxResultSize", "8g")
      // retain enough stage records for the biggest query's census read
      .config("spark.ui.retainedStages", "10000")
      .config("spark.ui.retainedJobs", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tracker = spark.sparkContext.statusTracker

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("st")) // streams: micro-batch floor, priced in BASELINE

    def runOnce(name: String, fn: (SparkSession, String) => DataFrame,
        group: Option[String]): Double = {
      spark.catalog.clearCache() // same per-run rule as graft.Bench
      group.foreach(g => spark.sparkContext.setJobGroup(g, g))
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      wall
    }

    case class Census(name: String, wall: Double, jobs: Int, stages: Int,
        tasks: Int)
    // the statusTracker is fed by the ASYNC listener bus: a sub-second
    // query's action returns before its events drain, so a raw read
    // undercounts exactly the class this census measures (r17 review).
    // Poll until two consecutive reads agree (bounded).
    def settledCounts(group: String): (Int, Int, Int) = {
      def read(): (Int, Int, Int) = {
        val jobIds = tracker.getJobIdsForGroup(group)
        val stageIds = jobIds.flatMap(id =>
          tracker.getJobInfo(id).map(_.stageIds().toSeq).getOrElse(Seq.empty))
          .distinct
        val tasks = stageIds.flatMap(sid =>
          tracker.getStageInfo(sid).map(_.numTasks())).sum
        (jobIds.length, stageIds.length, tasks)
      }
      var prev = (-1, -1, -1)
      var cur = read()
      var spins = 0
      // (0,0,0) is always UNSETTLED (r17 advice): every censused query
      // runs ≥ 1 job, so two consecutive zero reads mean the bus hasn't
      // surfaced the first job yet — not a stable answer. Keep polling
      // until a NONZERO read stabilizes or the spin budget expires.
      while ((cur != prev || cur == ((0, 0, 0))) && spins < 50) {
        prev = cur; Thread.sleep(100); cur = read(); spins += 1
      }
      cur
    }

    val rows = qs.flatMap { case (name, fn) =>
      try {
        runOnce(name, fn, None) // warm: codegen + file-listing caches
        val wall = runOnce(name, fn, Some(s"census-$name"))
        val (jobs, stages, tasks) = settledCounts(s"census-$name")
        Some(Census(name, wall, jobs, stages, tasks))
      } catch {
        case e: Exception =>
          Console.err.println(s"FAILED $name: ${e.getMessage}"); None
      }
    }

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    rows.sortBy(r => (-r.stages, -r.wall)).foreach { r =>
      println(f"${r.name}%-28s ${r.wall}%8.3f ${r.jobs}%5d ${r.stages}%7d ${r.tasks}%6d")
    }
    val sub = rows.filter(_.wall < 1.0)
    val hist = sub.groupBy(r => math.min(r.stages, 6)).toSeq.sortBy(_._1)
    println(s"\nsub-second queries: ${sub.size} of ${rows.size}; " +
      s"stage histogram (6=6+): " +
      hist.map { case (k, v) => s"$k->${v.size}" }.mkString(", "))
    val offenders = sub.filter(_.stages >= 3).sortBy(-_.stages)
    println(s"sub-second with >=3 stages (${offenders.size}):")
    offenders.foreach(r =>
      println(f"  ${r.name}%-28s ${r.wall}%6.3f s ${r.jobs}%2d jobs ${r.stages}%2d stages"))
    println(f"\nTOTAL wall (warm, ${rows.size} queries): ${rows.map(_.wall).sum}%.2f s; " +
      f"total stages ${rows.map(_.stages).sum}; total jobs ${rows.map(_.jobs).sum}")
    spark.stop()
  }
}
