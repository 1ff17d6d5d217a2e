package graft.sources

import graft.SparkSpec

/** the build-once contract behind the stored-path registrations
  * (st19/st20, x79): first call builds and publishes atomically, later
  * calls reuse the parquet artifact without re-running the build.
  */
class ArtifactStoreSpec extends SparkSpec {

  test("cached builds once, reuses thereafter, round-trips the frame") {
    val s = spark
    import s.implicits._
    // unique dir per test run so the spec never sees a stale artifact
    val dir = java.nio.file.Files
      .createTempDirectory("graft-artifact-spec").toString
    var builds = 0
    def make() = ArtifactStore.cached(spark, dir, "probe") {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val first = make().collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    assert(builds == 1 && first == Seq((1L, "a"), (2L, "b")))
    val second = make().collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    assert(builds == 1, "second call must NOT re-run the build")
    assert(second == first)
    // the published artifact carries parquet's completeness marker
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val out = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_artifacts/$tag/probe")
    assert(java.nio.file.Files.exists(out.resolve("_SUCCESS")))
  }
}
