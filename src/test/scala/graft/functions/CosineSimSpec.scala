package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

class CosineSimSpec extends SparkSpec {

  test("native expression is bit-identical to the higher-order composition") {
    CosineSim.register(spark)
    val e = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    // pair every vector with its id+1 neighbor — 499 distinct real pairs
    val pairs = e.select(col("vec_id"), col("v"))
      .join(e.select((col("vec_id") - 1).as("vec_id"), col("v").as("w")),
        Seq("vec_id"))
    val both = pairs.select(
      Similarity.cosine(col("v"), col("w")).as("hof"),
      expr("cosine_sim(v, w)").as("native"))
    val rows = both.collect()
    assert(rows.length > 400)
    rows.foreach { r =>
      // exact bit compare, not tolerance
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null in, null out; works from SQL") {
    CosineSim.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))),
      (None, Some(Seq(1.0, 0.0))))
      .toDF("a", "b")
    df.createOrReplaceTempView("cos_t")
    val out = spark.sql("SELECT cosine_sim(a, b) AS c FROM cos_t").collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0))
  }

  test("null ELEMENT in, null out — double and int8 kernels, eval + codegen") {
    CosineSim.register(spark)
    CosineSimI8.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](3.0, 4.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val out = df.selectExpr("cosine_sim(a, b) AS c").collect()
    assert(out(0).isNullAt(0))
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    val dfi = Seq(
      (Seq[Integer](1, null), Seq[Integer](1, 2)),
      (Seq[Integer](3, 4), Seq[Integer](3, 4)))
      .toDF("a", "b")
    val outI = dfi.selectExpr("cosine_sim_i8(a, b) AS c").collect()
    assert(outI(0).isNullAt(0))
    assert(math.abs(outI(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("native path is codegen-compatible (no interpreted fallback errors)") {
    CosineSim.register(spark)
    val e = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    // force a wholestage-codegen'd projection over many rows
    val sum = e.selectExpr("cosine_sim(v, v) AS c")
      .agg(org.apache.spark.sql.functions.sum("c")).collect()(0).getDouble(0)
    assert(math.abs(sum - 500.0) < 1e-9) // self-similarity = 1.0 each
  }
}
