package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MetaOps
import Model.ConfigFx

class RegistrySpec extends AnyFunSuite {

  private def fresh(): (ConnectionRegistry, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-reg")
    (ConnectionRegistry(dir.toString), dir)
  }

  test("upsert replaces by name then appends (catalog.rs:134-136)") {
    val (reg, _) = fresh()
    reg.upsert(ConfigFx("a", "rest", Map("uri" -> "u1")))
    reg.upsert(ConfigFx("b", "glue", Map("region" -> "eu-west-1")))
    reg.upsert(ConfigFx("a", "rest", Map("uri" -> "u2")))
    assert(reg.list.map(_.name) == Seq("b", "a")) // replaced a moved to end
    assert(reg.list.find(_.name == "a").get.config("uri") == "u2")
    assert(!reg.isNameUnique("a") && reg.isNameUnique("c"))
  }

  test("persistence round-trips through the JSON file") {
    val (reg, dir) = fresh()
    reg.upsert(ConfigFx("r1", "rest",
      Map("uri" -> "http://x", "auth_token" -> "top\"secret\\1")))
    val reloaded = ConnectionRegistry(dir.toString)
    assert(reloaded.list == reg.list)
    assert(reloaded.remove("r1") && !reloaded.remove("r1"))
  }

  test("sanitizedForDisplay masks non-empty auth tokens only (config.rs:107-124)") {
    val (reg, _) = fresh()
    reg.upsert(ConfigFx("r", "rest", Map("auth_token" -> "s3cr3t", "uri" -> "u")))
    reg.upsert(ConfigFx("g", "glue", Map("auth_token" -> "", "profile" -> "p")))
    val view = reg.sanitizedForDisplay.map(c => c.name -> c.config).toMap
    assert(view("r") == Map("auth_token" -> "***HIDDEN***", "uri" -> "u"))
    assert(view("g") == Map("auth_token" -> "", "profile" -> "p"))
  }

  test("A17 active filter count (components.rs:681-696)") {
    import MetaOps.SnapshotFilterParams
    assert(MetaOps.activeFilterCount(SnapshotFilterParams()) == 0)
    assert(MetaOps.activeFilterCount(SnapshotFilterParams(
      operationTypes = Seq("append"))) == 1)
    assert(MetaOps.activeFilterCount(SnapshotFilterParams(
      operationTypes = Seq("append"), filesAddedMin = Some(1),
      recordsAddedMax = Some(9), dateEnd = Some("2025-01-01"))) == 4)
  }
}
