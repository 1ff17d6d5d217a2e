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

  test("a marker-less partial artifact is replaced, not silently read") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-artifact-spec").toString
    // plant a pre-existing partial: the dir exists but parquet's
    // _SUCCESS does not (a crashed builder / external interference)
    val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val out = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_artifacts/$tag/part")
    java.nio.file.Files.createDirectories(out)
    java.nio.file.Files.writeString(out.resolve("garbage.bin"), "junk")
    var builds = 0
    def make() = ArtifactStore.cached(spark, dir, "part") {
      builds += 1
      Seq((7L, "x")).toDF("id", "v")
    }
    val got = make().collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(builds == 1 && got == Seq((7L, "x")),
      "partial must be rebuilt and replaced")
    assert(java.nio.file.Files.exists(out.resolve("_SUCCESS")))
    assert(!java.nio.file.Files.exists(out.resolve("garbage.bin")))
    // the r13 move-aside publish must not leave trash residue behind
    val siblings = out.getParent.toFile.list().toSeq
    assert(!siblings.exists(_.contains(".trash.")),
      s"publish left trash residue: $siblings")
    assert(!siblings.exists(_.contains(".tmp.")),
      s"publish left temp residue: $siblings")
  }

  test("a changed recipe rebuilds instead of reusing the stale artifact") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-artifact-spec").toString
    var builds = 0
    def make(recipe: String, v: String) =
      ArtifactStore.cached(spark, dir, "probe", recipe) {
        builds += 1
        Seq((1L, v)).toDF("id", "v")
      }
    assert(make("k5", "old").collect()(0).getString(1) == "old")
    assert(builds == 1)
    // same recipe → reuse; new recipe → its own artifact, fresh build
    assert(make("k5", "IGNORED").collect()(0).getString(1) == "old")
    assert(builds == 1)
    assert(make("k9", "new").collect()(0).getString(1) == "new")
    assert(builds == 2)
  }
}
