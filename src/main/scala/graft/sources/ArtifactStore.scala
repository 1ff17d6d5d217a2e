package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** build-once parquet artifact store for the stored-path query
  * registrations (st19/st20, x79): the artifact is a pure function of
  * the (static) data dir AND the build recipe, written into a
  * pid-unique temp dir and atomically renamed into place (the
  * Bench.stage discipline — concurrent cold starts cannot interleave
  * part files), then REUSED by every later invocation. Parquet's own
  * `_SUCCESS` is the completeness marker since the rename publishes it
  * atomically with the data.
  *
  * Two hardening rules (r12 ADVICE item 3):
  *   - a failed publish move is NOT assumed to mean "a concurrent
  *     builder won" — the winner's `_SUCCESS` is VERIFIED, and a
  *     marker-less obstruction (partial artifact, external interference)
  *     is cleared and the move retried, so a partial dir can never be
  *     silently read as the artifact;
  *   - the build recipe's parameters are part of the artifact PATH, so
  *     changing a build (band count, eval slice, cluster params) can
  *     never reuse a stale artifact built under the old recipe.
  *
  * In a deployment these are the stored dedup/graph artifacts on the
  * warehouse volume; here the bench's warm-up pass pays each build once
  * and the timed runs price only artifact-load + the incremental work.
  */
object ArtifactStore {

  private def rmTree(p: java.nio.file.Path): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(p.toFile)
  }

  def cached(spark: SparkSession, dir: String, name: String,
      recipe: String = "")(build: => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val rtag =
      if (recipe.isEmpty) ""
      else "_" + recipe.replaceAll("[^A-Za-z0-9.]", "_")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_artifacts/" +
      s"$tag/$name$rtag"
    val outP = Paths.get(out)
    def complete = Files.exists(outP.resolve("_SUCCESS"))
    if (!complete) {
      Files.createDirectories(outP.getParent)
      val tmp = Paths.get(out + ".tmp." + ProcessHandle.current().pid())
      build.write.mode("overwrite").parquet(tmp.toString)
      var published = false
      var attempts = 0
      while (!published && attempts < 5) {
        attempts += 1
        if (complete) {
          // a concurrent builder won AND its artifact is verified
          // complete — discard our copy, reuse the winner's
          rmTree(tmp)
          published = true
        } else {
          // marker-less obstruction = stale partial. Do NOT delete it in
          // place (r13 ADVICE item 2): between the marker check above and
          // a delete, a concurrent builder can atomically publish a
          // COMPLETE artifact here, and an in-place rmTree would then rip
          // files out from under readers mid-scan. Instead move the
          // obstruction aside ATOMICALLY, re-check ITS marker: a complete
          // artifact that slipped in is moved straight back (or, if yet
          // another builder won the now-empty slot, discarded — the
          // rebuild is identical by construction); only a verified
          // marker-less partial is ever deleted, and only at the trash
          // path where no reader resolves it.
          val trash = Paths.get(out + ".trash." + ProcessHandle.current()
            .pid() + "." + attempts)
          val moved =
            try { Files.move(outP, trash, StandardCopyOption.ATOMIC_MOVE); true }
            catch {
              case _: java.nio.file.NoSuchFileException => false // already gone
              case _: java.nio.file.FileSystemException => false // racer owns it
            }
          if (moved && Files.exists(trash.resolve("_SUCCESS"))) {
            // the obstruction WAS a complete publish — put it back
            try {
              Files.move(trash, outP, StandardCopyOption.ATOMIC_MOVE)
              rmTree(tmp)
              published = true
            } catch {
              case _: java.nio.file.FileSystemException =>
                rmTree(trash) // another complete publish beat the restore
            }
          } else if (moved) {
            rmTree(trash)
          }
          if (!published) {
            try {
              Files.move(tmp, outP, StandardCopyOption.ATOMIC_MOVE)
              published = true
            } catch {
              case _: java.nio.file.FileSystemException =>
                () // lost a race — loop re-checks the winner's marker
            }
          }
        }
      }
      require(published, s"could not publish artifact $out after 5 attempts")
    }
    spark.read.parquet(out)
  }
}
