package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All normalization that must happen exactly once at ingest lives here
  * (SURVEY.md §1.1: "parse once, eagerly") — notably `events.ts`, whose
  * physical parquet type has varied across driver-generated datasets:
  *   - TIMESTAMP(NANOS): Spark can only read it as long nanos
  *     (`spark.sql.legacy.parquet.nanosAsLong`); we truncate to micros,
  *     Spark's maximum precision (SURVEY.md §1.2 ns-precision gap);
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
  *     TIMESTAMP_NTZ, which Structured Streaming's event-time machinery
  *     and `unix_micros` reject; the session runs in UTC, so the cast to
  *     TIMESTAMP re-interprets the wall-clock as UTC — bit-identical
  *     epoch micros, and the same instant DuckDB's plain `timestamp`
  *     read of the file produces.
  * Downstream code always sees `ts: TIMESTAMP` (UTC) either way.
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
        case "events" if df.schema("ts").dataType == TimestampNTZType =>
          // NTZ wall-clock -> UTC instant (exact: session TZ is UTC)
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    })

  /** Register every table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
