package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-job floor forensics (r15 verdict task 1): runs a set of sub-second
  * queries under a given session conf and reports wall time plus
  * job/stage/task counts and summed task time — so fixed scheduling
  * overhead (jobs × launch floor, tasks × dispatch floor) is
  * attributable separately from real compute. Core (non-runtime) confs
  * like the shuffle writer selection must be set at session build, so
  * each scenario is one JVM invocation.
  *
  * Usage: runMain graft.FloorProbe <regex> <sfDir|-> [k=v ...]
  */
object FloorProbe {

  private class Counter extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      if (t.taskInfo != null)
        taskTimeMs += (t.taskInfo.finishTime - t.taskInfo.launchTime)
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0 }
  }

  def main(args: Array[String]): Unit = {
    val pat = args(0).r
    val dir = Some(args.lift(1).getOrElse("-")).filter(_ != "-")
      .getOrElse("/tmp/graft_bench_staged/_root_testdata_sf0.1_p2")
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val b = core.GraftSession.builder("graft-floorprobe", "32")
      .config("spark.driver.maxResultSize", "8g")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)

    val qs = SparkEntry.queries.toSeq
      .filter { case (n, _) => pat.findFirstIn(n).isDefined }
      .sortBy(_._1)
    println(s"${qs.size} queries, confs: ${confs.mkString(" ")}")

    def load1(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    def runAll(): Double = {
      var tot = 0.0
      qs.foreach { case (_, fn) =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        tot += (System.nanoTime() - t0) / 1e9
      }
      tot
    }

    runAll() // warm: JIT + codegen + footer cache
    var best = Double.MaxValue
    var bestStats = ""
    (1 to 3).foreach { sweep =>
      counter.reset()
      val t = runAll()
      val stats = s"jobs=${counter.jobs} stages=${counter.stages} " +
        f"tasks=${counter.tasks} taskTime=${counter.taskTimeMs / 1000.0}%.1f s"
      if (t < best) { best = t; bestStats = stats }
      println(f"  sweep $sweep ${t}%.2f s  load=${load1()}%.1f  $stats")
    }
    println(f"BEST ${best}%.2f s  $bestStats")
    spark.stop()
  }
}
