package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  test("typed Aggregator matches the built-in moments on real documents") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
    val lens = docs.select(col("n_chars")).as[Long]
    val agg = lens.select(CorpusStats.lengthStats.toColumn).collect()(0)
    val ref = docs.agg(
      count(lit(1)), avg("n_chars"), var_samp("n_chars"),
      min("n_chars"), max("n_chars")).collect()(0)
    assert(agg.n_docs == ref.getLong(0))
    assert(math.abs(agg.mean_len - ref.getDouble(1)) < 1e-9)
    assert(math.abs(agg.var_len - ref.getDouble(2)) / ref.getDouble(2) < 1e-9)
    assert(agg.min_len == ref.getLong(3) && agg.max_len == ref.getLong(4))
  }

  test("buffer merges associatively (the distributed-partial contract)") {
    val a = CorpusStats.lengthStats
    val chunks = Seq(Seq(1L, 2L), Seq(3L), Seq.empty[Long], Seq(10L, 20L, 30L))
    val partials = chunks.map(_.foldLeft(a.zero)(a.reduce))
    val leftFold = partials.reduce(a.merge)
    val rightFold = partials.reverse.reduce((x, y) => a.merge(y, x))
    assert(a.finish(leftFold) == a.finish(rightFold))
    val all = chunks.flatten.foldLeft(a.zero)(a.reduce)
    assert(a.finish(all) == a.finish(leftFold))
  }
}
