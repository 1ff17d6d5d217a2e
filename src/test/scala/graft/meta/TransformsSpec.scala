package graft.meta

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.IcebergMurmur

/** Partition-transform evaluation against the PUBLIC Iceberg spec's own
  * test vectors (Appendix B "32-bit Hash Requirements" + the transform
  * examples), plus expression-vs-reference-impl agreement.
  */
class TransformsSpec extends SparkSpec {

  test("murmur3 reference impl reproduces the Iceberg spec hash vectors") {
    assert(IcebergMurmur.hashLong(34L) == 2017239379) // int/long vector
    assert(IcebergMurmur.hashString("iceberg") == 1210000089) // string vector
    // int widens to long: bucket(34 int) == bucket(34 long) by construction
    assert(IcebergMurmur.hashLong(34) == IcebergMurmur.hashLong(34L))
  }

  test("native iceberg_hash expression matches the reference impl") {
    val s = spark
    import s.implicits._
    val vals = Seq(0L, 1L, 34L, -1L, -34L, Long.MaxValue, Long.MinValue,
      4294967296L, 1234567890123456789L)
    val df = vals.toDF("v")
    graft.functions.IcebergHash.register(s)
    val got = df.select(col("v"), expr("iceberg_hash(v)").as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vals.foreach(v => assert(got(v) == IcebergMurmur.hashLong(v),
      s"hash mismatch for $v"))
  }

  test("bucket values are in [0, n) and match the spec formula") {
    val s = spark
    import s.implicits._
    graft.functions.IcebergHash.register(s)
    val df = (0L until 200L).toDF("v")
    val rows = df.select(col("v"), Transforms.bucket(col("v"), 16).as("b"))
      .collect()
    rows.foreach { r =>
      val expect = (IcebergMurmur.hashLong(r.getLong(0)) & Int.MaxValue) % 16
      assert(r.getInt(1) == expect && r.getInt(1) >= 0 && r.getInt(1) < 16)
    }
    // spec example: bucket hash of 34 → 2017239379
    val b34 = df.filter(col("v") === 34)
      .select(Transforms.bucket(col("v"), 16)).head().getInt(0)
    assert(b34 == 2017239379 % 16)
  }

  test("truncate floors negatives down; string truncate keeps w chars") {
    val s = spark
    import s.implicits._
    val df = Seq(0L, 1L, 99L, 100L, 101L, -1L, -100L, -101L).toDF("v")
    val got = df.select(col("v"), Transforms.truncLong(col("v"), 100).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 99L -> 0L, 100L -> 100L,
      101L -> 100L, -1L -> -100L, -100L -> -100L, -101L -> -200L))
    val st = Seq("iceberg").toDF("s")
      .select(Transforms.truncString(col("s"), 3)).head().getString(0)
    assert(st == "ice")
  }

  test("time transforms reproduce the Iceberg spec examples") {
    val s = spark
    import s.implicits._
    // spec examples: 2017-11-16 → year 47, month 574, day 17486;
    // hour = day 17486 × 24 + 22 = 419686
    val df = Seq("2017-11-16 22:31:08").toDF("raw")
      .select(col("raw").cast("timestamp").as("ts"))
    val r = df.select(
      Transforms.yearT(col("ts")).as("y"),
      Transforms.monthT(col("ts")).as("m"),
      Transforms.dayT(col("ts")).as("d"),
      Transforms.hourT(col("ts")).as("h"),
      Transforms.voidT.as("v")).head()
    assert(r.getInt(0) == 47)
    assert(r.getInt(1) == 574)
    assert(r.getInt(2) == 17486)
    assert(r.getLong(3) == 419686L)
    assert(r.isNullAt(4))
  }

  test("eval dispatches rendered transform tags") {
    val s = spark
    import s.implicits._
    graft.functions.IcebergHash.register(s)
    val df = Seq((34L, "iceberg")).toDF("v", "s")
    val r = df.select(
      Transforms.eval("identity", col("v")).as("a"),
      Transforms.eval("bucket[16]", col("v")).as("b"),
      Transforms.eval("truncate[3]", col("s"), sourceIsString = true).as("c"),
      Transforms.eval("void", col("v")).as("d")).head()
    assert(r.getLong(0) == 34L && r.getInt(1) == 2017239379 % 16 &&
      r.getString(2) == "ice" && r.isNullAt(3))
    intercept[IllegalArgumentException] {
      Transforms.eval("zigzag[3]", col("v"))
    }
  }
}
