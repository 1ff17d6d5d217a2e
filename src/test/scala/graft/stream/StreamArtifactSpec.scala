package graft.stream

import graft.SparkSpec

/** st19/st20 — the STORED-artifact stream gates must be row-equal to
  * their in-stream-rebuild twins (r11 verdict task 5): same in-flight
  * plan, artifact values == rebuild values, so the only difference the
  * bench may observe is WHERE the batch-side resolution came from.
  */
class StreamArtifactSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decontamGateStreamWith(stored index) row-equals decontamGate") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sorted.toSeq
    val rebuilt = rows(StreamOps.decontamGate(spark, dir))
    // the artifact a deployment materializes once per eval release
    val index = graft.llm.Dedup.bands(graft.llm.Dedup.minhashSignature(
        graft.core.Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 10 === 0)))
      .select(col("band"), col("bh"), col("doc_id").as("eval_id"))
    val stored = rows(StreamOps.decontamGateStreamWith(spark, dir, index,
      "st_decontam_gate_stored_spec"))
    assert(rebuilt.nonEmpty && stored == rebuilt)
  }

  test("decontamFlagStreamWith emits exactly the DISTINCT flagged docs " +
      "of the collision listing, once each") {
    import org.apache.spark.sql.functions.col
    val index = graft.llm.Dedup.bands(graft.llm.Dedup.minhashSignature(
        graft.core.Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 10 === 0)))
      .select(col("band"), col("bh"), col("doc_id").as("eval_id"))
    val listing = StreamOps.decontamGateStreamWith(spark, dir, index,
        "st_decontam_flag_listing_spec").collect()
      .map(_.getLong(0)).toSet
    val flags = StreamOps.decontamFlagStreamWith(spark, dir, index,
        "st_decontam_flag_spec").collect().map(_.getLong(0)).toSeq
    assert(flags.nonEmpty)
    assert(flags.distinct == flags, "each flagged doc must appear once")
    assert(flags.toSet == listing,
      "flag set must equal the listing's distinct doc set")
  }

  test("mediaPhashGateStream == brute tau-pairs across the catalog split") {
    import org.apache.spark.sql.functions.col
    val mediaDir = graft.llm.LlmQueries.MEDIA
    val split = StreamOps.MediaGateSplit
    // ground truth from the fixture's authored hashes (x80's oracle
    // proves the engine re-derives them bit-exactly)
    val hs = graft.llm.Multimodal.mediaRows
      .flatMap(m => m.phash64.map(m.media_id -> _))
    val brute = (for {
      (u, hu) <- hs if u >= split
      (c, hc) <- hs if c < split
      d = java.lang.Long.bitCount(hu ^ hc) if d <= 7
    } yield (u, c, d)).sorted
    val index = graft.llm.Multimodal.imagePhash(
        spark.read.parquet(s"$mediaDir/media.parquet"))
      .filter(col("media_id") < split && col("phash64").isNotNull)
    val got = StreamOps.mediaPhashGateStream(spark, mediaDir, index,
        sinkName = "st_media_phash_gate_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(brute.nonEmpty && got == brute)
    // the planted variant family must be flagged; the unrelated
    // uploads must not pair with anything
    assert(got.map(_._1).distinct.size < hs.count(_._1 >= split))
  }

  test("mediaPhashGateStream fails fast on tau >= nBands (r13 advice: " +
      "the band probe would silently lose recall)") {
    val index = spark.emptyDataFrame
    val e = intercept[IllegalArgumentException] {
      StreamOps.mediaPhashGateStream(spark, graft.llm.LlmQueries.MEDIA,
        index, tau = 8, sinkName = "st_media_phash_guard_spec")
    }
    assert(e.getMessage.contains("exact only"))
    intercept[IllegalArgumentException] {
      StreamOps.mediaPhashGateStream(spark, graft.llm.LlmQueries.MEDIA,
        index, tau = -1, sinkName = "st_media_phash_guard_spec")
    }
  }

  test("mediaQualityGateStream row-equals the batch gate (st13 discipline)") {
    val mediaDir = graft.llm.LlmQueries.MEDIA
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).sorted.toSeq
    val batch = rows(graft.llm.Multimodal.mediaQualityGate(
      spark.read.parquet(s"$mediaDir/media.parquet")))
    val streamed = rows(StreamOps.mediaQualityGateStream(spark, mediaDir,
      "st_media_quality_gate_spec"))
    assert(batch.nonEmpty && streamed == batch)
    assert(streamed.exists(!_._4) && streamed.exists(_._4),
      "both verdicts must occur or the gate is vacuous")
  }

  test("takedownClusterGateStreamWith(stored clusters) row-equals st17") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val rebuilt = rows(StreamOps.takedownClusterGateStream(spark, dir))
    val clusters = graft.llm.Dedup.dupClusters(
      graft.core.Tables.load(spark, dir, "documents"))
    val stored = rows(StreamOps.takedownClusterGateStreamWith(spark, dir,
      clusters, 41L, "st_takedown_cluster_stored_spec"))
    assert(rebuilt.nonEmpty && stored == rebuilt)
    // both actions must occur or the gate is vacuous on this corpus
    assert(stored.exists(_._2 == "forget") && stored.exists(_._2 == "ingest"))
  }
}
