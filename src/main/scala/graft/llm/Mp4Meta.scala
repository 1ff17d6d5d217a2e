package graft.llm

import java.nio.ByteBuffer

/** Real MP4 (ISO BMFF) container-metadata parsing in pure JVM code: the
  * format is a tree of big-endian [size:u32][type:4cc] boxes, so the
  * movie header (`moov`/`mvhd`) — timescale + duration — is reachable
  * with a plain box walk, no codec library. FRAME decode (the codec
  * payload inside `mdat`) is genuinely out of reach without a decoder
  * and remains the one marked stub in [[Multimodal]]; this parser makes
  * the metadata column REAL the same way [[WavCodec]] did for audio.
  */
object Mp4Meta {

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length > 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  case class Mp4Stats(timescale: Long, duration: Long, durationMs: Long)

  /** walk the top-level boxes to `moov`, then its children to `mvhd`
    * (version 0: u32 timescale/duration at offsets 12/16 past the box
    * header; version 1: u64 duration); None for non-MP4 or malformed
    */
  def decode(bytes: Array[Byte]): Option[Mp4Stats] = {
    if (!isMp4(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes) // big-endian by default
      def findBox(end: Int, name: String): Option[(Int, Int)] = {
        // returns (contentStart, contentEnd) of the first `name` box
        // between bb.position() and end
        var pos = bb.position()
        while (pos + 8 <= end) {
          val size = bb.getInt(pos)
          val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
          if (size < 8 || pos + size > end) return None
          if (tpe == name) return Some((pos + 8, pos + size))
          pos += size
        }
        None
      }
      bb.position(0)
      findBox(bytes.length, "moov").flatMap { case (ms, me) =>
        bb.position(ms)
        findBox(me, "mvhd").flatMap { case (hs, _) =>
          val version = bytes(hs) & 0xff
          if (version == 0) {
            val timescale = bb.getInt(hs + 12).toLong & 0xffffffffL
            val duration = bb.getInt(hs + 16).toLong & 0xffffffffL
            if (timescale == 0) None
            else Some(Mp4Stats(timescale, duration,
              duration * 1000L / timescale))
          } else {
            val timescale = bb.getInt(hs + 20).toLong & 0xffffffffL
            val duration = bb.getLong(hs + 24)
            if (timescale == 0) None
            else Some(Mp4Stats(timescale, duration,
              duration * 1000L / timescale))
          }
        }
      }
    } catch { case _: Exception => None }
  }

  /** minimal valid fixture: ftyp + moov(mvhd v0) + a tiny mdat stub —
    * real box structure, deterministic bytes
    */
  def encode(timescale: Int, duration: Long,
      mdatBody: Array[Byte]): Array[Byte] = {
    def box(tpe: String, content: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + content.length)
      bb.putInt(8 + content.length).put(tpe.getBytes("US-ASCII"))
        .put(content)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    val mvhdContent = {
      val bb = ByteBuffer.allocate(100) // mvhd v0 fixed size
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // creation/modification time
        .putInt(timescale)
        .putInt(duration.toInt)
        .putInt(0x00010000) // rate 1.0
        .putShort(0x0100.toShort) // volume 1.0
      bb.position(bb.position() + 10) // reserved
      // unity matrix
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(2) // next track id
      bb.array()
    }
    ftyp ++ box("moov", box("mvhd", mvhdContent)) ++ box("mdat", mdatBody)
  }
}
