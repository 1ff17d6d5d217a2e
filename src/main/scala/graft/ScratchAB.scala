package graft

import org.apache.spark.sql.functions._

/** throwaway A/B harness (not registered anywhere): times the r14
  * three-scan media dedup/funnel compositions against the r15 fused
  * single-decode paths on the staged sf media table
  */
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      "/tmp/graft_bench_staged/_root_testdata_sf0.1_p2")
    val spark = core.GraftSession.builder("graft-ab", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def media = spark.read.parquet(s"$dir/media.parquet")
    import llm.Multimodal._

    def oldKeep() = mediaDedupKeepFrom(
      media.select(col("media_id"), col("kind")),
      imagePhash(media), audioFingerprint(media), videoPhash(media))
    def oldFunnel() = {
      val q = mediaQualityGate(media)
      val survivors = q.filter(col("keep")).select(col("media_id"))
      val kept = media.join(survivors, Seq("media_id"))
      val d = mediaDedupKeepFrom(
        kept.select(col("media_id"), col("kind")),
        imagePhash(kept), audioFingerprint(kept), videoPhash(kept))
      q.groupBy(col("kind")).agg(count(lit(1)).as("n_in"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .select(lit("quality").as("stage"), col("kind"), col("n_in"),
          col("n_kept"))
        .unionByName(d.groupBy(col("kind")).agg(count(lit(1)).as("n_in"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          .select(lit("dedup").as("stage"), col("kind"), col("n_in"),
            col("n_kept")))
    }
    def newKeep() = mediaDedupKeep(media)
    def newFunnel() = mediaCurationFunnel(media)
    def extractOnly() = mediaExtractAll(media)

    def time(name: String, fn: () => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val x = mediaExtractAll(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    x.count()
    val img = x.select(col("media_id"), col("kind"), col("phash64"))
    val aud = x.select(col("media_id"), col("kind"), col("audiofp64"))
    val vid = x.filter(col("fr_phash64").isNotNull)
      .select(col("media_id"),
        posexplode(col("fr_phash64")).as(Seq("frame_idx", "fphash64")))
    def timeK(name: String, fn: () => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    timeK("nd_img", () => imageNearDupFrom(img))
    timeK("nd_aud", () => hammingNearDupFrom(aud, "audiofp64", 7, 8,
      llm.Dedup.MaxBucket))
    timeK("nd_vid", () => videoNearDupFrom(vid))
    timeK("keep_from", () => mediaDedupKeepFrom(
      x.select(col("media_id"), col("kind")), img, aud, vid))
    time("extract_only", () => extractOnly())
    time("new_keep", () => newKeep())
    spark.stop()
  }
}
