package graft

/** Plan auditor: prints the formatted physical plan for the named queries
  * (all relational queries by default) so scan pushdown, broadcast
  * choices, and codegen spans can be reviewed per round.
  *
  * Usage: runMain graft.Explain [nameRegex] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse("^q").r
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = core.GraftSession.builder("graft-explain", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => pattern.findFirstIn(n).isDefined }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
