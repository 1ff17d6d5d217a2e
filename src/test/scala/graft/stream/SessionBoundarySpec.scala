package graft.stream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Pins the session-window closure boundary the st02 oracle depends on:
  * append mode emits a session once the final watermark has passed its
  * end. This spec constructs a session whose end lands EXACTLY on the
  * max event time (watermark with 0s delay) plus one safely-closed and
  * one still-open session, and asserts which of them emit — documenting
  * the engine's boundary semantics instead of assuming them.
  */
class SessionBoundarySpec extends SparkSpec {

  test("session emission boundary at end == watermark") {
    val s = spark
    import s.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-sess-src")
    def ts(m: Int, sec: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:$sec%02d")
    // gap = 30 min:
    //   user 1: event at 10:00        → session end 10:30
    //   user 2: event at 10:05        → session end 10:35
    //   user 3: event at 10:30        → the max event time = watermark
    // user 1's end (10:30) == watermark exactly; user 2's end is beyond;
    // user 3's session is open
    Seq((ts(0), 1L), (ts(5), 2L), (ts(30), 3L)).toDF("ts", "user_id")
      .coalesce(1).write.mode("append").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val agg = spark.readStream.schema(schema).parquet(src.toString)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
    val q = agg.writeStream.format("memory").queryName("sess_boundary")
      .option("checkpointLocation", StreamOps.checkpointDir("sess_boundary"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table("sess_boundary")
      .select("user_id").collect().map(_.getLong(0)).toSet
    // the st02 oracle encodes end <= max_ts ⇒ users {1}: verify exactly
    assert(emitted == Set(1L),
      s"closure rule changed — st02 oracle must be updated; emitted=$emitted")
  }
}
