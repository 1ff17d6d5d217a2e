package graft.rel

import java.sql.Timestamp

import graft.SparkSpec

/** q33/q34 event-analytics semantics on constructed timelines — the
  * boundary rules the oracle equality alone can't single out.
  */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex.map { case ((u, et, t), i) =>
      (i.toLong, ts(t), u, et, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("funnel: ordering and 7-day windows gate each step") {
    val df = eventsDf(Seq(
      // user 0: full funnel in order
      (0L, "view", "2024-01-01 10:00:00"),
      (0L, "click", "2024-01-02 10:00:00"),
      (0L, "purchase", "2024-01-03 10:00:00"),
      // user 1: click BEFORE the first view — doesn't count
      (1L, "click", "2024-01-01 09:00:00"),
      (1L, "view", "2024-01-01 10:00:00"),
      // user 2: click 8 days after the view — outside the window
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-09 11:00:00"),
      // user 3: view+click, purchase 8 days after the click — excluded
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-01 11:00:00"),
      (3L, "purchase", "2024-01-09 12:00:00"),
      // user 4: purchase only — no view, not in the funnel at all
      (4L, "purchase", "2024-01-01 10:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel")
    df.write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val out = RelQueries.queries("q33_funnel")(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out == Map(0L -> 3, 1L -> 1, 2L -> 1, 3L -> 2))
  }

  test("cohort retention: offsets count from each user's first week") {
    // two users in week A (one returns a week later), one user in week B
    val df = eventsDf(Seq(
      (0L, "view", "2024-01-01 10:00:00"),
      (0L, "view", "2024-01-09 10:00:00"), // next week
      (1L, "view", "2024-01-02 10:00:00"),
      (2L, "view", "2024-01-10 10:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft-cohort")
    df.write.mode("overwrite")
      .parquet(dir.resolve("events.parquet").toString)
    val out = RelQueries.queries("q34_cohort_retention")(spark, dir.toString)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> ((r.getLong(2),
        r.getDouble(3))))
      .toMap
    val cohorts = out.keys.map(_._2).toSet
    assert(cohorts.size == 2, s"expected 2 cohorts, got $cohorts")
    val a = cohorts.min
    assert(out((0L, a)) == ((2L, 1.0)), "week-A cohort has 2 users at offset 0")
    assert(out((1L, a)) == ((1L, 0.5)), "half the week-A cohort returns")
  }
}
