package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the sf-proportional bench corpus ([[MediaCorpus]]): every
  * quality-gate class is populated, the planted near-dup variants are
  * recovered by the engine's own search operators, the authored columns
  * match the fixture schema (the oracle-path-rewrite contract in
  * tools/bench_duck.py), and generation is deterministic.
  */
class MediaCorpusSpec extends SparkSpec {

  private val n = 250L
  private lazy val dir = {
    val out = java.nio.file.Files
      .createTempDirectory("media_corpus_spec").toString
    MediaCorpus.write(spark, s"$out/media.parquet", n)
    out
  }
  private def corpus = spark.read.parquet(s"$dir/media.parquet")

  test("schema matches the committed fixture exactly") {
    val fixture = spark.read
      .parquet(s"${LlmQueries.MEDIA}/media.parquet")
    assert(corpus.schema == fixture.schema)
  }

  test("every quality-gate class fires on real rows") {
    val reasons = Multimodal.mediaQualityGate(corpus)
      .select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(Set("pass", "too_small", "exposure", "silence", "clipping_risk",
      "too_short").forall(r => r == "too_small" || reasons.contains(r)),
      s"reasons=$reasons")
    // both exposure directions trip the same rule — check the stats
    val b = corpus.filter(col("kind") === "image")
      .agg(min("px_brightness"), max("px_brightness")).head()
    assert(b.getDouble(0) < Multimodal.ExposureLo)
    assert(b.getDouble(1) > Multimodal.ExposureHi)
  }

  test("planted image variants are recovered by the banded search") {
    val found = Multimodal.imageNearDup(corpus)
      .filter(col("id_b") === col("id_a") + 1 && col("id_b") % 5 === 4)
      .count()
    assert(found == n / 5, s"found=$found want=${n / 5}")
  }

  test("planted audio variants are recovered by the banded search") {
    val nAud = math.max(8L, n / 4)
    val found = Multimodal.audioNearDup(corpus)
      .filter(col("id_b") === col("id_a") + 1 && col("id_b") % 5 === 4)
      .count()
    assert(found == nAud / 5, s"found=$found want=${nAud / 5}")
  }

  test("trimmed clips contain their source; cut clips split into scenes") {
    val nVid = math.max(8L, n / 8)
    val found = Multimodal.videoNearDup(corpus)
      .filter(col("id_b") === col("id_a") + 1 && col("id_b") % 5 === 4)
      .count()
    assert(found == nVid / 5, s"found=$found want=${nVid / 5}")
    val cuts = Multimodal.sceneChanges(corpus)
      .filter(col("n_scenes") >= 2).count()
    // cut clips: local id ≡ 1 (mod 17) — plus their trimmed variants,
    // whose 5-frame prefix keeps the boundary (frames 3→4)
    val want = (0L until nVid).count(i =>
      (i % 5 != 4 && i % 17 == 1) || (i % 5 == 4 && (i - 1) % 17 == 1))
    assert(cuts == want, s"cuts=$cuts want=$want")
  }

  test("tEXt rows round-trip through the chunk walker") {
    val planted = corpus.filter(col("txt_keys").isNotNull)
    val nText = planted.count()
    assert(nText > 0)
    val walked = Multimodal.pngTextChunks(corpus)
      .groupBy("media_id").count()
    assert(walked.count() == nText)
    // every walked pair equals the authored pair (keyword AND value)
    val bad = Multimodal.pngTextChunks(corpus).alias("w")
      .join(planted.alias("p"), col("w.media_id") === col("p.media_id"))
      .filter(col("w.keyword") =!=
          element_at(col("p.txt_keys"), col("w.chunk_idx") + 1) ||
        col("w.value") =!=
          element_at(col("p.txt_vals"), col("w.chunk_idx") + 1))
      .count()
    assert(bad == 0)
  }

  test("authored hash columns equal the engine's re-derivation") {
    val img = Multimodal.imagePhash(corpus).alias("e")
      .join(corpus.alias("c"), col("e.media_id") === col("c.media_id"))
      .filter(col("e.phash64") =!= col("c.phash64")).count()
    assert(img == 0)
    val aud = Multimodal.audioFingerprint(corpus).alias("e")
      .join(corpus.alias("c"), col("e.media_id") === col("c.media_id"))
      .filter(col("e.audiofp64") =!= col("c.audiofp64")).count()
    assert(aud == 0)
  }

  test("generation is deterministic") {
    val out2 = java.nio.file.Files
      .createTempDirectory("media_corpus_spec2").toString
    MediaCorpus.write(spark, s"$out2/media.parquet", n)
    val a = corpus.orderBy("media_id")
      .select(md5(lower(hex(col("payload"))))).collect().map(_.getString(0))
    val b = spark.read.parquet(s"$out2/media.parquet").orderBy("media_id")
      .select(md5(lower(hex(col("payload"))))).collect().map(_.getString(0))
    assert(a.toSeq == b.toSeq)
  }
}
