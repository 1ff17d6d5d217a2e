package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** minhash_bands: in-row MinHash LSH band keys, interpreted AND codegen
  * paths, pinned bit-identical to BOTH predecessors — the grouped
  * signature path (Dedup.minhashSignature → bands) and the in-row HOF
  * path (the former bandsInRow formulation, reconstructed here
  * verbatim as the parity model).
  */
class MinhashBandsSpec extends SparkSpec {

  import graft.llm.Dedup.{BandSize, MinhashMod, NumHashes}

  /** the EXACT former bandsInRow HOF composition over a token column */
  private def hofBands = {
    val tk = col("tk")
    val n = size(tk)
    val sh = array_distinct(transform(sequence(lit(1), n - 2), i =>
      concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
        element_at(tk, i + 2))))
    val hu = transform(transform(sh, s => md5(s)), m =>
      struct(conv(substring(m, 1, 8), 16, 10).cast("long").as("u1"),
        conv(substring(m, 9, 8), 16, 10).cast("long").as("u2")))
    val mins = (1 to NumHashes).map { i =>
      array_min(transform(hu, h =>
        (h.getField("u1") + lit(i.toLong) * h.getField("u2"))
          % MinhashMod))
    }
    val nBands = NumHashes / BandSize
    array((0 until nBands).map { b =>
      concat_ws("|", (1 to BandSize).map(j =>
        mins(b * BandSize + j - 1)): _*)
    }: _*)
  }

  test("matches the HOF band keys on random, unicode, and repeat-heavy docs") {
    MinhashBands.register(spark)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val vocab = Seq("the", "cat", "sat", "on", "a", "mat", "再见", "naïve",
      "x", "𐍈")
    val texts = Seq(
      "the cat sat on the mat",
      "the the the the the",                 // distinct-shingle collapse
      "一 二 三 四 五",
      "a b c") ++
      (1 to 40).map(_ => Seq.fill(3 + rnd.nextInt(60))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("tk"))
    val both = df.select(col("id"),
        call_function("minhash_bands", col("tk")).as("native"),
        hofBands.as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getInt(0)}")
    }
  }

  test("matches the grouped signature path's band keys on the sf0.001 corpus") {
    MinhashBands.register(spark)
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val grouped = graft.llm.Dedup.bands(
        graft.llm.Dedup.minhashSignature(docs))
      .select(col("doc_id"), col("band"), col("bh"))
    val native = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        posexplode(call_function("minhash_bands", col("tk")))
          .as(Seq("p", "bh")))
      .select(col("doc_id"), (col("p") + 1).as("band"), col("bh"))
    assert(native.exceptAll(grouped).isEmpty && grouped.exceptAll(native).isEmpty)
    assert(native.count() == grouped.count() && native.count() > 0)
  }

  test("short docs yield an empty array; null token array yields null") {
    MinhashBands.register(spark)
    val s = spark
    import s.implicits._
    val df = Seq(
        (1, Some(Seq("a", "b"))),       // < 3 tokens
        (2, Some(Seq.empty[String])),
        (3, None: Option[Seq[String]]))
      .toDF("id", "tk")
    val out = df.select($"id",
        call_function("minhash_bands", $"tk").as("b")).collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(out(1) == Seq.empty && out(2) == Seq.empty && out(3) == null)
  }

  test("null tokens are skipped with their separator, like concat_ws") {
    MinhashBands.register(spark)
    val s = spark
    import s.implicits._
    // shingle at position 1 of (a, null, c, d): concat_ws -> "a c"
    val withNull = Seq((1, Seq(Some("a"), None, Some("c"), Some("d"))))
      .toDF("id", "tk")
    val native = withNull.select(
      call_function("minhash_bands", $"tk")).head.getSeq[String](0)
    val hof = withNull
      .select($"id", col("tk"))
      .select(hofBands.as("b")).head.getSeq[String](0)
    assert(native == hof)
  }

  test("runs inside whole-stage codegen") {
    MinhashBands.register(spark)
    val s = spark
    import s.implicits._
    val df = (1 to 8).map(i => (i, s"a b c d $i"))
      .toDF("id", "text")
      .select($"id", split($"text", " ").as("tk"))
    val q = df.repartition(2)
      .select(call_function("minhash_bands", $"tk"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[minhashbands""".r
      .findFirstIn(plan).isDefined, plan)
  }
}
