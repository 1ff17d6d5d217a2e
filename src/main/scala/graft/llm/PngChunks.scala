package graft.llm

/** PNG chunk-level metadata: a spec-shaped chunk walker (length / type /
  * data / CRC framing, ISO 15948 §5.3) over the payload bytes — the
  * image-side analogue of [[Mp4Meta]]'s box walker. Two pipeline uses:
  * extracting embedded text metadata (`tEXt` keyword/value pairs —
  * Software, Comment, Author provenance strings), and STRIPPING the
  * text chunks a training pipeline must not leak (the provenance /
  * PII-hygiene pass for image corpora): pixels are untouched because
  * only non-critical text chunks are removed, so the stripped payload
  * decodes bit-identically (spec-pinned).
  *
  * Authoring twin: [[withText]] splices `tEXt` chunks (CRC32 over
  * type+data, the PNG CRC rule) before `IEND`, so fixtures carry real
  * in-container metadata the engine then re-extracts.
  */
object PngChunks {

  /** text-bearing chunk types the strip pass removes (tEXt and its
    * compressed/international variants)
    */
  private val TextTypes = Set("tEXt", "zTXt", "iTXt")

  private def u32(bytes: Array[Byte], off: Int): Int =
    ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)

  /** walk the chunk sequence: (type, dataOffset, dataLength) per chunk;
    * empty for non-PNG or malformed payloads (truncated framing stops
    * the walk at the last well-formed chunk)
    */
  def chunks(bytes: Array[Byte]): Seq[(String, Int, Int)] = {
    if (!ImageCodec.isPng(bytes)) return Seq.empty
    val out = scala.collection.mutable.ListBuffer[(String, Int, Int)]()
    var off = 8
    while (off + 12 <= bytes.length) {
      val len = u32(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return out.toSeq
      val ctype = new String(bytes, off + 4, 4, "ISO-8859-1")
      out += ((ctype, off + 8, len))
      off += 12 + len
    }
    out.toSeq
  }

  /** tEXt keyword/value pairs (Latin-1, NUL-separated per the spec);
    * empty for non-PNG payloads or PNGs without text chunks
    */
  def textChunks(bytes: Array[Byte]): Seq[(String, String)] =
    chunks(bytes).collect { case ("tEXt", off, len) =>
      val data = bytes.slice(off, off + len)
      val nul = data.indexOf(0.toByte)
      if (nul < 0) (new String(data, "ISO-8859-1"), "")
      else (new String(data, 0, nul, "ISO-8859-1"),
        new String(data, nul + 1, data.length - nul - 1, "ISO-8859-1"))
    }

  /** number of text-bearing chunks the strip pass would remove */
  def textChunkCount(bytes: Array[Byte]): Int =
    chunks(bytes).count(c => TextTypes.contains(c._1))

  /** payload with all text chunks removed (identity for non-PNG bytes);
    * critical chunks are byte-copied, so pixels decode identically.
    * Bytes AFTER the last well-formed chunk (a truncated final chunk,
    * trailing junk) are byte-copied verbatim (r13 ADVICE item 4): the
    * walker stops at the malformed frame, and silently dropping its
    * bytes would break the "only text chunks removed" contract.
    */
  def stripText(bytes: Array[Byte]): Array[Byte] = {
    val cs = chunks(bytes)
    if (cs.isEmpty || !cs.exists(c => TextTypes.contains(c._1))) return bytes
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    out.write(bytes, 0, 8)
    cs.foreach { case (ctype, off, len) =>
      if (!TextTypes.contains(ctype)) out.write(bytes, off - 8, len + 12)
    }
    // tail passthrough: everything past the last well-formed chunk's CRC
    val tailStart = cs.map { case (_, off, len) => off + len + 4 }.max
    if (tailStart < bytes.length)
      out.write(bytes, tailStart, bytes.length - tailStart)
    out.toByteArray
  }

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** authoring twin: splice `tEXt` chunks immediately before IEND */
  def withText(bytes: Array[Byte], kvs: Seq[(String, String)]): Array[Byte] = {
    require(ImageCodec.isPng(bytes), "withText needs a PNG payload")
    val iendOff = chunks(bytes).collectFirst { case ("IEND", off, _) =>
      off - 8
    }.getOrElse(throw new IllegalArgumentException("no IEND chunk"))
    val out = new java.io.ByteArrayOutputStream(bytes.length + 64)
    out.write(bytes, 0, iendOff)
    kvs.foreach { case (k, v) =>
      val ctype = "tEXt".getBytes("ISO-8859-1")
      val data = k.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
        v.getBytes("ISO-8859-1")
      out.write(be32(data.length))
      out.write(ctype)
      out.write(data)
      out.write(be32(crc32(ctype, data)))
    }
    out.write(bytes, iendOff, bytes.length - iendOff)
    out.toByteArray
  }
}
