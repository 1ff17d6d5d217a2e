package graft.stream

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** T4 — real late-data semantics: two `Trigger.AvailableNow` rounds over
  * one checkpoint. Round 1 advances the watermark; a row arriving in
  * round 2 with event time older than the watermark must be DROPPED from
  * the windowed aggregation, while on-time rows keep flowing.
  */
class WatermarkSpec extends SparkSpec {

  test("rows older than the advanced watermark are dropped in append mode") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-late-src")
    val ckpt = Files.createTempDirectory("graft-late-ckpt")
    val sink = Files.createTempDirectory("graft-late-sink")

    def writeBatch(name: String, rows: Seq[(java.sql.Timestamp, String)]): Unit =
      rows.toDF("ts", "k").coalesce(1).write.mode("append")
        .parquet(src.toString)

    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    def runOnce(): Unit = {
      val schema = spark.read.parquet(src.toString).schema
      val agg = spark.readStream.schema(schema).parquet(src.toString)
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 hour"), $"k").count()
        .select($"window.start".as("ws"), $"k", $"count")
      val q = agg.writeStream.format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // round 1: events up to 12:30 → watermark advances to 12:20, the
    // 10:00 and 11:00 windows finalize and emit
    writeBatch("b1", Seq(
      ts(10, 5) -> "a", ts(10, 20) -> "a", ts(11, 10) -> "b",
      ts(12, 30) -> "a"))
    runOnce()
    val after1 = spark.read.parquet(sink.toString)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws").toString,
        r.getAs[String]("k"), r.getAs[Long]("count"))).toSet
    assert(after1 == Set(
      ("2024-01-01 10:00:00.0", "a", 2L),
      ("2024-01-01 11:00:00.0", "b", 1L)))

    // round 2: one LATE row (10:40 — behind the 12:20 watermark → must be
    // dropped, the already-emitted 10:00 window is NOT revised) and one
    // on-time row closing the 12:00 window
    writeBatch("b2", Seq(ts(10, 40) -> "a", ts(13, 40) -> "a"))
    runOnce()
    val after2 = spark.read.parquet(sink.toString)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("ws").toString,
        r.getAs[String]("k"), r.getAs[Long]("count"))).toSet
    assert(after2 == after1 ++ Set(("2024-01-01 12:00:00.0", "a", 1L)),
      s"late 10:40 row must not revise the closed 10:00 window: $after2")
  }
}
