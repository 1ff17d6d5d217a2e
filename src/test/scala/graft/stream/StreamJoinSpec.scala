package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** stream-stream interval join boundary semantics: the attribution window
  * is CLOSED on both ends ([click_ts, click_ts + 30 min]), purchases
  * before the click never match, and users never cross-match.
  */
class StreamJoinSpec extends SparkSpec {

  test("interval join bounds are inclusive; pre-click and cross-user rows drop") {
    val s = spark
    import s.implicits._
    val src = Files.createTempDirectory("graft-ssj-src")

    def ts(t: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $t")
    // (event_id, ts, user_id, event_type, value)
    Seq(
      (1L, ts("10:00:00"), 7L, "click", 0.0),
      (2L, ts("10:00:00"), 7L, "purchase", 5.0), // same instant: inclusive
      (3L, ts("10:30:00"), 7L, "purchase", 6.0), // exactly +30 min: inclusive
      (4L, ts("10:30:00.000001"), 7L, "purchase", 7.0), // 1 µs past: out
      (5L, ts("09:59:59"), 7L, "purchase", 8.0), // before the click: out
      (6L, ts("10:10:00"), 8L, "purchase", 9.0) // other user: out
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(src.toString)

    val schema = spark.read.parquet(src.toString).schema
    val ev = spark.readStream.schema(schema).parquet(src.toString)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"), $"value")
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      $"user_id" === $"p_user_id" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" <= $"click_ts" + expr("INTERVAL 30 MINUTES"))
    val out = StreamOps.runToTable(
      joined.select($"click_id", $"purchase_id", $"value"),
      "ssj_boundary", "append").collect()
      .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      .toSet
    assert(out == Set((1L, 2L), (1L, 3L)))
  }
}
