package graft.llm

import scala.util.Random

import graft.SparkSpec

/** seeded property tests for the round-7 pipeline ops — randomized
  * corpora with FIXED seeds, so failures reproduce exactly.
  */
class PipelinePropsSpec extends SparkSpec {

  private def randCorpus(seed: Long, nDocs: Int, vocab: Int,
      maxLen: Int): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    (0 until nDocs).map { i =>
      val n = 1 + rnd.nextInt(maxLen)
      val words = Seq.fill(n)(s"w${rnd.nextInt(vocab)}")
      (i.toLong, words.mkString(" "), s"src${rnd.nextInt(4)}")
    }
  }

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("segmentDedup with an unreachable df threshold is the identity " +
      "on full segments") {
    val rows = randCorpus(seed = 41, nDocs = 40, vocab = 30, maxLen = 25)
    val df = docsDf(rows)
    val out = TextOps.segmentDedup(df, k = 3, minDf = 1000).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("cleaned")))).toMap
    rows.foreach { case (id, text, _) =>
      val toks = text.split(" ")
      val full = toks.take(toks.length / 3 * 3).mkString(" ")
      assert(out(id) == ((0L, full)),
        s"doc $id must keep every full segment in order")
    }
  }

  test("segmentDedup removal counts are consistent with corpus-wide dfs") {
    val rows = randCorpus(seed = 42, nDocs = 60, vocab = 8, maxLen = 15)
    val df = docsDf(rows)
    // tiny vocab -> many repeated 3-grams; recompute dfs in plain Scala
    val segsByDoc = rows.map { case (id, text, _) =>
      val toks = text.split(" ")
      id -> (0 until toks.length / 3).map(i =>
        toks.slice(i * 3, i * 3 + 3).mkString(" "))
    }.toMap
    val dfCount = segsByDoc.toSeq
      .flatMap { case (id, segs) => segs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.size }
    val out = TextOps.segmentDedup(df, k = 3, minDf = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned")))).toMap
    segsByDoc.foreach { case (id, segs) =>
      val kept = segs.filter(s => dfCount(s) < 3)
      val removed = segs.size - kept.size
      assert(out(id) == ((segs.size.toLong, removed.toLong,
        kept.mkString(" "))), s"doc $id mismatch")
    }
  }

  test("cmsHeavyHitters: est >= exact on a randomized corpus and the " +
      "estimate sum per row is conserved") {
    val rows = randCorpus(seed = 43, nDocs = 50, vocab = 200, maxLen = 40)
    val df = docsDf(rows)
    val out = Sketches.cmsHeavyHitters(df).collect()
    val nTotal = rows.map(_._2.split(" ").length.toLong).sum
    assert(out.length == rows.flatMap(_._2.split(" ")).distinct.size)
    out.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("true_cnt"))
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("est") - r.getAs[Long]("true_cnt"))
      assert(r.getAs[Boolean]("heavy") ==
        (r.getAs[Long]("est") * 100 >= nTotal))
    }
  }

  test("domainCap: per-source kept set has exactly ceil(sqrt(n)) members " +
      "and ranks are a permutation") {
    val rows = randCorpus(seed = 44, nDocs = 120, vocab = 50, maxLen = 10)
    val out = Sampling.domainCap(docsDf(rows)).collect()
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val n = rs.length
      val cap = math.ceil(math.sqrt(n.toDouble)).toLong
      assert(rs.head.getAs[Long]("n_source") == n.toLong)
      assert(rs.count(_.getAs[Boolean]("kept")) == cap)
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to n.toLong).toSeq)
      // kept rows are exactly ranks 1..cap
      assert(rs.filter(_.getAs[Boolean]("kept"))
        .map(_.getAs[Long]("rk")).sorted.toSeq == (1L to cap).toSeq)
    }
  }
}
