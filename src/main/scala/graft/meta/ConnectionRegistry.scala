package graft.meta

import java.nio.file.{Files, Path, Paths}

/** Connection registry + config persistence (S3/S8/U3, P14):
  * `/root/reference/src/catalog.rs:122-152` + `src/config.rs:10-124`.
  *
  * Driver-side by design — the registry is a handful of connection
  * definitions, not data-plane state. Persistence is a single JSON file
  * (the reference's `~/.hielo/config.json` shape: a `catalogs` array of
  * `{catalog_type, name, config{}}`), created with defaults when missing.
  */
class ConnectionRegistry(path: Path) {

  import Model.ConfigFx

  private var catalogs: Vector[ConfigFx] = load()

  def list: Seq[ConfigFx] = catalogs

  /** replace-then-push upsert by name (`catalog.rs:134-136` — U3: retain
    * everything with a different name, then append)
    */
  def upsert(c: ConfigFx): Unit = {
    catalogs = catalogs.filterNot(_.name == c.name) :+ c
    save()
  }

  def remove(name: String): Boolean = {
    val before = catalogs.size
    catalogs = catalogs.filterNot(_.name == name)
    if (catalogs.size != before) { save(); true } else false
  }

  /** name-uniqueness invariant (`config.rs:100-103`) */
  def isNameUnique(name: String): Boolean = !catalogs.exists(_.name == name)

  /** P14 — display view with credentials masked (`config.rs:107-124`);
    * r18: the OAuth2 `credential` key (client secret) masks like
    * auth_token.
    */
  def sanitizedForDisplay: Seq[ConfigFx] = catalogs.map { c =>
    c.copy(config = c.config.map {
      case (k @ ("auth_token" | "credential"), v) if v.nonEmpty =>
        k -> "***HIDDEN***"
      case kv => kv
    })
  }

  // ---- JSON persistence (no extra deps: hand-rolled, escaped) --------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def save(): Unit = {
    val body = catalogs.map { c =>
      val kv = c.config.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
        .mkString("{", ", ", "}")
      s"""{"catalog_type": "${esc(c.catalog_type)}", "name": "${esc(c.name)}", "config": $kv}"""
    }.mkString("[", ", ", "]")
    Files.createDirectories(path.getParent)
    Files.writeString(path, s"""{"catalogs": $body}""")
  }

  /** create-default-on-missing (`config.rs:17-31`) */
  private def load(): Vector[ConfigFx] =
    if (!Files.exists(path)) Vector.empty
    else ConnectionRegistry.parse(Files.readString(path))
}

object ConnectionRegistry {

  def apply(dir: String): ConnectionRegistry =
    new ConnectionRegistry(Paths.get(dir, "config.json"))

  import Model.ConfigFx

  /** minimal JSON reader for the config shape written by save() */
  private[meta] def parse(s: String): Vector[ConfigFx] = {
    // tokenizer-free extraction: objects are flat and strings are escaped
    val entry =
      """\{"catalog_type":\s*"((?:[^"\\]|\\.)*)",\s*"name":\s*"((?:[^"\\]|\\.)*)",\s*"config":\s*\{((?:[^{}"]|"(?:[^"\\]|\\.)*")*)\}\}""".r
    val pair = """"((?:[^"\\]|\\.)*)":\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(x: String): String = x
      .replace("\\\"", "\"").replace("\\n", "\n").replace("\\\\", "\\")
    entry.findAllMatchIn(s).map { m =>
      val cfg = pair.findAllMatchIn(m.group(3))
        .map(p => unesc(p.group(1)) -> unesc(p.group(2))).toMap
      ConfigFx(unesc(m.group(2)), unesc(m.group(1)), cfg)
    }.toVector
  }
}
