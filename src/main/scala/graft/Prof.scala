package graft

/** Phase profiler for a single query: splits DataFrame build, Catalyst
  * analysis/optimization/physical planning, and execution so fixed
  * per-query overhead is attributable (bench floor forensics).
  *
  * Usage: runMain graft.Prof <queryName> [sfDir]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = core.GraftSession.builder("graft-prof", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis + optimize + plan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"run $i: build ${(t1 - t0) / 1e9}%.3f  plan ${(t2 - t1) / 1e9}%.3f  exec ${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
