package graft.llm

import graft.SparkSpec

/** Round-10 retrieval compositions: x62 two-stage PQ rerank and
  * x63 hybrid lexical+vector RRF fusion.
  */
class RetrievalSpec extends SparkSpec {

  private def embDf(rows: Seq[(Long, Seq[Float])]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** 12 deterministic 4-dim vectors, none zero */
  private val toyVecs: Seq[(Long, Seq[Float])] =
    (0L until 12L).map(i =>
      i -> Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat - 5f))

  test("pqRerankTopK with a full-corpus shortlist equals exact brute top-k") {
    val e = embDf(toyVecs)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id", "cos", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val rer = rows(Similarity.pqRerankTopK(e, Seq(0L, 5L), nQueries = 3,
      k = 3, kShort = 12, nSub = 2, dim = 4))
    val brute = rows(Similarity.bruteForceTopKNative(e, 3, 3))
    assert(rer.nonEmpty && rer == brute,
      "a shortlist covering the corpus must make the rerank exact (bitwise)")
  }

  test("pqRerankTopK output is drawn from the ADC shortlist") {
    val e = embDf(toyVecs)
    val short = Similarity.pqTopK(e, Seq(0L, 5L), nQueries = 3, k = 4,
        nSub = 2, dim = 4)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rer = Similarity.pqRerankTopK(e, Seq(0L, 5L), nQueries = 3,
        k = 2, kShort = 4, nSub = 2, dim = 4)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rer.subsetOf(short), "rerank can only reorder the shortlist")
    assert(rer.size == 3 * 2)
  }

  test("hybridRrfTopK fuses the two legs with exact RRF arithmetic") {
    // doc 1 leads BOTH legs for query doc 0; doc 2 is lexical-only
    // overlap, doc 3 vector-only proximity; 4/5 are background
    val docs = docsDf(Seq(
      0L -> "alpha beta gamma delta epsilon",
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "gamma delta epsilon omega psi",
      3L -> "one two three four",
      4L -> "five six seven eight",
      5L -> "nine ten eleven twelve"))
    val embs = embDf(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 0f, 1f, 0f),
      3L -> Seq(0.5f, 0.5f, 0f, 0f),
      4L -> Seq(0f, 0f, 0.6f, 0.8f),
      5L -> Seq(0f, 1f, 0f, 0f)))
    val out = Similarity.hybridRrfTopK(docs, embs, nQueries = 1, k = 4,
        kLeg = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5)))
      .sortBy(_._6)
    assert(out.forall(_._1 == 0L))
    // winner: rank 1 in both legs, rrf = 2/61 exactly
    val top = out.head
    assert(top._2 == 1L && top._3.contains(1) && top._4.contains(1))
    assert(top._5 == 1.0 / 61 + 1.0 / 61)
    // every row's rrf is recomputable from its leg ranks
    out.foreach { case (_, _, lr, vr, rrf, _) =>
      val expect = lr.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vr.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(rrf == expect)
    }
    // doc 3 reaches the fused top-4 on its vector leg alone
    val d3 = out.find(_._2 == 3L).get
    assert(d3._3.isEmpty && d3._4.nonEmpty)
  }

  test("refreshPipeline assigns every refresh action correctly") {
    val s = spark
    import s.implicits._
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val old = df(Seq(0L -> "alpha", 1L -> "beta", 2L -> "gamma",
      3L -> "delta"))
    // 0 unchanged; 1 edited; 2 removed; 10 adds NEW content;
    // 11 re-adds doc 3's verbatim content under a fresh id
    val next = df(Seq(0L -> "alpha", 1L -> "beta prime",
      3L -> "delta", 10L -> "epsilon", 11L -> "gamma"))
    val out = Pipeline.refreshPipeline(old, next).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(4)))).toMap
    assert(out(0L) == (("unchanged", "skip")))
    assert(out(1L) == (("changed", "ingest")))
    assert(out(2L) == (("removed", "forget")))
    assert(out(3L) == (("unchanged", "skip")))
    assert(out(10L) == (("added", "ingest")))
    assert(out(11L) == (("added", "drop_dup")),
      "verbatim old content under a new id must be dropped as a dup")
  }

  test("annRecallAudit: rerank recall dominates raw ADC recall per query") {
    // theorem (ties aside): pq top-k ⊆ the kShort shortlist, and the
    // exact rerank ranks every true-top-k member of the shortlist above
    // all non-members — so hit_rerank ≥ hit_pq, row by row
    val e = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val cents = Seq(100L, 150L, 200L, 250L, 300L, 350L, 400L, 450L)
    val rows = Similarity.annRecallAudit(e, cents, nQueries = 10, k = 5)
      .select("q_id", "hit_pq", "hit_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 10)
    rows.foreach { case (q, pq, rr) =>
      assert(rr >= pq, s"query $q: rerank $rr < pq $pq") }
  }
}
