package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All normalization that must happen exactly once at ingest lives here
  * (SURVEY.md §1.1: "parse once, eagerly") — notably the `events.ts`
  * nanosecond timestamp, which Spark can only read as long nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`); we truncate to micros, Spark's
  * maximum precision (SURVEY.md §1.2 ns-precision gap).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // resolved-relation memo: every spark.read.parquet pays a fresh file
  // listing + footer/schema read on the driver; the fixture tables are
  // immutable, so the analyzed DataFrame (and its FileIndex) is reused
  // across queries — the local analogue of a shared catalog relation
  // cache on a cluster
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((System.identityHashCode(spark), dir, name), { _ =>
      val df = spark.read.parquet(s"$dir/$name.parquet")
      name match {
        case "events" if df.schema("ts").dataType == LongType =>
          // long nanos since epoch -> timestamp (micros, truncating).
          // Integer DIV: double division would lose precision at 1e18 ns.
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case _ => df
      }
    })

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
