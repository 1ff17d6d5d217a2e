package graft

/** Per-query plan-construction cost census: for every registered query,
  * time DataFrame construction + analysis/optimization/physical
  * planning (no execution) on a WARM session — the per-run fixed cost
  * the bench pays 4× per query that never touches an executor.
  *
  * Usage: runMain graft.PlanTime [sfDir]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      "/tmp/graft_bench_staged/_root_testdata_sf0.1_p2")
    val spark = core.GraftSession.builder("graft-plantime", "32")
      .config("spark.driver.maxResultSize", "8g").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("st")) // streams execute on build
    def once(): Seq[(String, Double)] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, dir)
        df.queryExecution.executedPlan
        ()
      } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    once() // cold: fills codegen/analysis caches
    val warm = once()
    val tot = warm.map(_._2).sum
    println(f"TOTAL plan time (warm, ${warm.size} queries): $tot%.2f s")
    warm.sortBy(-_._2).take(20).foreach { case (n, t) =>
      println(f"  $n%-28s $t%.3f s")
    }
    sys.env.get("SPARK_GRAFT_PLANCONF").foreach { kvs =>
      kvs.split(";").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
      once()
      val t2 = once().map(_._2).sum
      println(f"TOTAL with $kvs: $t2%.2f s")
    }
    spark.stop()
  }
}
