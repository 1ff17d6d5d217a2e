package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Decode-persist A/B at media SCALE (r18 verdict task 3): the r18
  * sf0.1 rejections of the x81/x83/x85 demo-wrapper hash persists were
  * measured on ~10k 64×48 thumbnails where a second decode pass is
  * ~60 ms — guide §5's recompute-vs-cache verdict is scale-dependent,
  * so this main re-runs the same A/B at the MediaBench corpus size
  * (default 100k images + 25k WAVs + 12.5k clips; SPARK_GRAFT_MEDIA_N
  * overrides) where the re-decoded volume is seconds, not
  * milliseconds.
  *
  *   A: the shipped demo shape — `imageNearDup`/`audioNearDup`/
  *      `videoNearDup`, whose opaque decode pass re-executes once per
  *      reference of the hash frame (2× for the hamming modalities,
  *      4× for the video containment join).
  *   B: the persist variant — decode once into a persisted
  *      (media_id, kind, hash) frame, run the `*From` search over it,
  *      unpersist after the action.
  *
  * Both sides noop-sink, cache cleared per run, warm-up + 3 alternating
  * A/B rounds (pair-position bias guard), wall + stages + summed task
  * time per side (the r18 adjudication metrics).
  */
object MediaPersistAB {

  private class Counter extends org.apache.spark.scheduler.SparkListener {
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); ()
    }
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      if (t.taskInfo != null)
        taskMs.addAndGet(t.taskInfo.finishTime - t.taskInfo.launchTime)
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_MEDIA_N", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder("graft-media-persist-ab", cpus)
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same reader batch cap as MediaBench (binary payload rows)
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "256")
    val dir = MediaBench.stageMedia(spark, n)
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)

    def media(kind: String): DataFrame =
      spark.read.parquet(s"$dir/$kind.parquet")

    def run(label: String)(mk: => (DataFrame, Seq[DataFrame])): Unit = {
      spark.catalog.clearCache()
      val (s0, t0ms) = (counter.stages.get, counter.taskMs.get)
      val t0 = System.nanoTime()
      val (df, caches) = mk
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      caches.foreach(_.unpersist(blocking = true))
      Thread.sleep(300) // listener bus settle
      val st = counter.stages.get - s0
      val tt = (counter.taskMs.get - t0ms) / 1000.0
      println(f"$label%-14s wall=$wall%7.2f s  stages=$st%3d  taskTime=$tt%8.1f s")
    }

    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def imgA = (Multimodal.imageNearDup(media("images")),
      Seq.empty[DataFrame])
    def imgB = {
      val h = Multimodal.imagePhash(media("images")).persist(lvl)
      (Multimodal.imageNearDupFrom(h), Seq(h))
    }
    def audA = (Multimodal.audioNearDup(media("audio")),
      Seq.empty[DataFrame])
    def audB = {
      val h = Multimodal.audioFingerprint(media("audio")).persist(lvl)
      (Multimodal.hammingNearDupFrom(h, "audiofp64", 7, 8,
        graft.llm.Dedup.MaxBucket), Seq(h))
    }
    def vidA = (Multimodal.videoNearDup(media("video")),
      Seq.empty[DataFrame])
    def vidB = {
      val h = Multimodal.videoPhash(media("video")).persist(lvl)
      (Multimodal.videoNearDupFrom(h), Seq(h))
    }

    println(s"n=$n dir=$dir cpus=$cpus")
    // warm-up (JIT + footer cache), then 3 alternating rounds
    run("warm img A")(imgA); run("warm img B")(imgB)
    run("warm aud A")(audA); run("warm aud B")(audB)
    run("warm vid A")(vidA); run("warm vid B")(vidB)
    (1 to 3).foreach { r =>
      println(s"--- round $r")
      run(s"img A")(imgA); run(s"img B")(imgB)
      run(s"aud A")(audA); run(s"aud B")(audB)
      run(s"vid A")(vidA); run(s"vid B")(vidB)
    }
    spark.stop()
  }
}
