package graft.llm

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-validates the md5-banded MinHash pipeline against mllib's
  * `MinHashLSH` (SURVEY §2.11 X5 lists it as the alternate mechanism):
  * on a corpus with engineered near-duplicates, both implementations must
  * surface the same high-Jaccard pairs. The md5 pipeline stays the
  * shipped path because its signatures are oracle-reproducible in SQL;
  * mllib is the library-interop escape hatch.
  */
class MllibLshSpec extends SparkSpec {

  test("md5-banded candidates agree with mllib MinHashLSH on true near-dups") {
    val s = spark
    import s.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "CHANGED" else s"w$i")
      .mkString(" ")
    val others = (0 until 6).map(d =>
      (100 to 140).map(i => s"v${d}_$i").mkString(" "))
    val texts = Seq(base, nearDup) ++ others
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    // our pipeline: shingle-minhash band candidates + exact Jaccard
    val ours = Dedup.jaccardOnCandidates(docs)
      .filter($"jaccard" >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // mllib: binary token vectors over a shared vocabulary
    val toks = docs.select($"doc_id",
      array_distinct(split($"text", " ")).as("tk"))
    val vocab = toks.select(explode($"tk").as("tok")).distinct()
      .orderBy("tok").collect().map(_.getString(0)).zipWithIndex.toMap
    val n = vocab.size
    val vectors = toks.as[(Long, Seq[String])].map { case (id, tk) =>
      val idx = tk.map(vocab).sorted.toArray
      (id, Vectors.sparse(n, idx, Array.fill(idx.length)(1.0)))
    }.toDF("doc_id", "features")
    val model = new MinHashLSH().setNumHashTables(8).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(vectors)
    val mllibPairs = model.approxSimilarityJoin(vectors, vectors, 0.5,
        "dist")
      .select($"datasetA.doc_id".as("a"), $"datasetB.doc_id".as("b"))
      .filter($"a" < $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ours.contains((0L, 1L)), s"md5 pipeline missed the near-dup: $ours")
    assert(mllibPairs.contains((0L, 1L)),
      s"mllib missed the near-dup: $mllibPairs")
    // neither should pair unrelated docs at this threshold
    assert(ours == Set((0L, 1L)))
  }
}
