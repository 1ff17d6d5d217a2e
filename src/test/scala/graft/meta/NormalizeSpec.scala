package graft.meta

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NormalizeSpec extends SparkSpec {

  import Model.SnapshotFx

  private def snap(id: Long, sum: Option[Map[String, String]]) =
    SnapshotFx("c", "ns", "t", id, 1000L * id, s"m$id", Some(1), sum)

  private def opsOf(rows: Seq[SnapshotFx]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    Normalize.snapshots(rows.toDS().toDF())
      .select($"snapshot_id", $"op").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("operation inference follows iceberg_adapter.rs:169-187 precedence") {
    val ops = opsOf(Seq(
      snap(1, Some(Map("operation" -> "replace"))), // explicit wins
      snap(2, Some(Map("spark.app.id" -> "app-1"))), // spark ⇒ append
      snap(3, Some(Map("added-records" -> "5"))), // added-* ⇒ append
      snap(4, Some(Map("deleted-data-files" -> "2"))), // deleted-* ⇒ delete
      snap(5, Some(Map("total-data-files" -> "9"))), // total ⇒ overwrite
      snap(6, Some(Map("something-else" -> "x"))), // default append
      snap(7, None))) // null summary ⇒ unknown (data.rs:156-161)
    assert(ops == Map(1L -> "replace", 2L -> "append", 3L -> "append",
      4L -> "delete", 5L -> "overwrite", 6L -> "append", 7L -> "unknown"))
  }

  test("spark.app.id outranks added-* which outranks deleted-*") {
    val ops = opsOf(Seq(
      snap(1, Some(Map("spark.app.id" -> "a", "deleted-records" -> "1"))),
      snap(2, Some(Map("added-records" -> "1", "deleted-records" -> "1")))))
    assert(ops(1L) == "append" && ops(2L) == "append")
  }

  test("asU64 has Rust parse::<u64> fidelity: digits only") {
    val s = spark
    import s.implicits._
    val df = Seq("123", "0", "12.5", "-4", "abc", "", "1e3")
      .toDF("v").select(Normalize.asU64(col("v")).as("n"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSeq == Seq(Some(123L), Some(0L), None, None, None, None, None))
  }

  test("size_change renders per data.rs:170-184") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      snap(1, Some(Map("added-files-size" -> "10", "removed-files-size" -> "3"))),
      snap(2, Some(Map("added-files-size" -> "10"))),
      snap(3, Some(Map("operation" -> "append"))),
      snap(4, None))
    val out = Normalize.snapshots(rows.toDS().toDF())
      .select($"snapshot_id", $"size_change").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "+10 -3", 2L -> "+10", 3L -> "N/A", 4L -> "N/A"))
  }

  test("records_added defaults to the string \"0\" (data.rs:163-168)") {
    val s = spark
    import s.implicits._
    val out = Normalize.snapshots(Seq(snap(1, None),
        snap(2, Some(Map("added-records" -> "77")))).toDS().toDF())
      .select($"snapshot_id", $"records_added").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "0", 2L -> "77"))
  }

  test("maskSecret hides auth_token but not empty tokens or other keys") {
    val s = spark
    import s.implicits._
    val df = Seq(("auth_token", "tok"), ("auth_token", ""), ("region", "eu"))
      .toDF("k", "v")
      .select(Normalize.maskSecret(col("k"), col("v")).as("m"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("***HIDDEN***", "", "eu"))
  }
}
