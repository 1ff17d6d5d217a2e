package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("partitioned write: round trip + directory pruning in the plan") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, "en", "a"), (1L, "de", "b"), (2L, "en", "c"))
      .toDF("doc_id", "lang", "text")
    val out = Files.createTempDirectory("graft-sink-part").toString
    Sinks.writePartitioned(df, out, Seq("lang"))
    // hive-style layout on disk
    assert(Files.exists(java.nio.file.Paths.get(s"$out/lang=en")))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/lang=de")))
    // round trip (column order differs: partition col moves last)
    val back = spark.read.parquet(out)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(back == Set((0L, "en", "a"), (1L, "de", "b"), (2L, "en", "c")))
    // a lang predicate is a PARTITION filter (pruned before file I/O),
    // not a data filter
    val plan = spark.read.parquet(out).filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("lang"), plan.take(600))
  }

  test("bucketed tables join with no exchange on either side") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      val b = (0L until 100L).map(i => (i, i % 7)).toDF("doc_id", "label")
      Sinks.writeBucketed(a, "sink_bucket_a", "doc_id", 4)
      Sinks.writeBucketed(b, "sink_bucket_b", "doc_id", 4)
      val joined = spark.table("sink_bucket_a")
        .join(spark.table("sink_bucket_b"), Seq("doc_id"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: the one-shuffle-at-write-time payoff
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS sink_bucket_a")
      spark.sql("DROP TABLE IF EXISTS sink_bucket_b")
    }
  }
}
