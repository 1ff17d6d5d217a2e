package graft.llm

import java.nio.ByteBuffer

/** Real MP4 (ISO BMFF) container parsing in pure JVM code: the format
  * is a tree of big-endian [size:u32][type:4cc] boxes, so the movie
  * header (`moov`/`mvhd`) — timescale + duration — is reachable with a
  * plain box walk, no codec library.
  *
  * FRAME decode (r7 verdict task 6): compressed codecs (H.264 etc.) are
  * genuinely out of reach without a decoder library, so the fixture
  * video track carries UNCOMPRESSED 8-bit luma frames in a spec-shaped
  * `'raw '` visual sample entry — the sample TABLES (`stsd` dimensions,
  * `stts` timing, `stsz` sizes, `stco` chunk offset) are real ISO BMFF
  * structures, and [[decodeFrames]] locates and slices every frame out
  * of `mdat` exactly the way a real demuxer hands samples to a codec.
  * What stays simplified: one track, one chunk, uniform sample size,
  * no vmhd/dinf (the walker tolerates their absence) — the seam where
  * a compressed codec would plug in is the per-frame byte slice.
  */
/** The inter-frame-codec seam (r16 verdict task 7; narrowed r18): the
  * boundary a pure-JDK build genuinely cannot cross is INTER-FRAME
  * video — P/B slices need motion compensation and most real streams
  * entropy-code with CABAC, and nothing in the JDK implements either
  * (confirmed: `javax.imageio` is still-image only, JavaFX/JMF are not
  * on a server classpath). ALL-INTRA H.264 (CAVLC) is inside the
  * boundary as of r18 — [[graft.llm.h264.H264Decoder.AvcIntraDecoder]]
  * decodes it from the public spec. This trait is the drop-in contract
  * for a real decoder library at the remaining boundary:
  *
  *   - INPUT: one demuxed sample exactly as [[Mp4Meta.demuxVideo]]
  *     slices it out of `mdat` — the container work (sample-table walk,
  *     byte-range cut, timing) is already done on this side of the seam;
  *   - OUTPUT: the row-major `width`×`height` 8-bit luma plane, the one
  *     shape every downstream frame operator consumes (per-frame
  *     brightness, DCT pHash, scene-cut deltas are all pure functions
  *     of this plane).
  *
  * A JNI/FFI H.264/AV1 decoder implements these two members and joins
  * [[Mp4Meta.decoders]]; no operator, query, or schema changes —
  * proven by Mp4MetaSpec, which wires a stand-in compressed-codec
  * decoder through [[Mp4Meta.decodeTrack]] and re-derives the MJPEG
  * path ([[Mp4Meta.MjpegDecoder]] is exactly such a plug-in).
  */
trait FrameDecoder {
  /** the stsd sample-entry 4ccs this decoder accepts (e.g. "avc1") */
  def codecs: Set[String]

  /** decode ONE demuxed sample to its luma plane; None on a decode
    * failure or a dimension mismatch (a track with any failing sample
    * is rejected whole rather than served truncated)
    */
  def decodeLuma(sample: Array[Byte], width: Int,
      height: Int): Option[Array[Byte]]

  /** r18: sample-entry extradata hook — codecs whose parameter sets
    * live OUT-OF-BAND in the sample entry (H.264's `avcC` box under an
    * `avc1` entry) rewrite the demuxed samples into self-contained
    * units here before per-sample decode; default identity (raw, MJPEG
    * and in-band avc3 need nothing)
    */
  def normalizeSamples(samples: IndexedSeq[Array[Byte]],
      extradata: Option[Array[Byte]]): IndexedSeq[Array[Byte]] = samples
}

object Mp4Meta {

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length > 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  case class Mp4Stats(timescale: Long, duration: Long, durationMs: Long)

  /** (contentStart, contentEnd) of the first `name` box in
    * bytes[from, end) — one level, no recursion
    */
  private def findBox(bytes: Array[Byte], from: Int, end: Int,
      name: String): Option[(Int, Int)] = {
    val bb = ByteBuffer.wrap(bytes) // big-endian by default
    var pos = from
    while (pos + 8 <= end) {
      val size = bb.getInt(pos)
      val tpe = new String(bytes, pos + 4, 4, "US-ASCII")
      if (size < 8 || pos + size > end) return None
      if (tpe == name) return Some((pos + 8, pos + size))
      pos += size
    }
    None
  }

  /** walk the top-level boxes to `moov`, then its children to `mvhd`
    * (version 0: u32 timescale/duration at offsets 12/16 past the box
    * header; version 1: u64 duration); None for non-MP4 or malformed
    */
  def decode(bytes: Array[Byte]): Option[Mp4Stats] = {
    if (!isMp4(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes)
      findBox(bytes, 0, bytes.length, "moov").flatMap { case (ms, me) =>
        findBox(bytes, ms, me, "mvhd").flatMap { case (hs, _) =>
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

  /** a decoded raw-luma video track: frame i covers media time
    * [i·frameDelta, (i+1)·frameDelta) in `timescale` units
    */
  case class VideoTrack(width: Int, height: Int, timescale: Long,
      frameDelta: Long, frames: IndexedSeq[Array[Byte]]) {
    def frameTsMs(i: Int): Long = i * frameDelta * 1000L / timescale
  }

  /** demuxed-but-undecoded samples of the first video track: the codec
    * 4cc from `stsd` plus each sample's raw byte slice, located by the
    * sample tables — what a real demuxer hands a codec
    */
  case class VideoSamples(codec: String, width: Int, height: Int,
      timescale: Long, frameDelta: Long, samples: IndexedSeq[Array[Byte]],
      /** sample-entry decoder-config child box payload when present
        * (H.264: the `avcC` box under an `avc1`/`avc3` entry — the
        * out-of-band SPS/PPS + NAL length size real muxers emit)
        */
      extradata: Option[Array[Byte]] = None)

  /** demux the first video track: trak → mdia → {mdhd timescale, hdlr
    * must be 'vide', minf → stbl → {stsd format + dimensions, stts
    * (count, delta), stsz, stco chunk offset}}, then slice each sample
    * straight out of the file bytes. Handles both stsz shapes: a
    * uniform sample_size (the raw-luma track) and the per-sample size
    * TABLE (sample_size == 0 — how variable-size codecs like MJPEG
    * store their samples). None for non-MP4 input, a missing/non-video
    * track, or malformed tables; codec-agnostic — the caller decides
    * which 4cc it can decode.
    */
  def demuxVideo(bytes: Array[Byte]): Option[VideoSamples] = {
    if (!isMp4(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes)
      for {
        (ms, me) <- findBox(bytes, 0, bytes.length, "moov")
        (ts, te) <- findBox(bytes, ms, me, "trak")
        (mds, mde) <- findBox(bytes, ts, te, "mdia")
        (mh, _) <- findBox(bytes, mds, mde, "mdhd")
        timescale = bb.getInt(mh + 12).toLong & 0xffffffffL
        if timescale > 0
        (hl, _) <- findBox(bytes, mds, mde, "hdlr")
        if new String(bytes, hl + 8, 4, "US-ASCII") == "vide"
        (mi, mie) <- findBox(bytes, mds, mde, "minf")
        (st, ste) <- findBox(bytes, mi, mie, "stbl")
        (sd, sde) <- findBox(bytes, st, ste, "stsd")
        // first sample entry: [size][format 4cc] at content offset 8
        codec = new String(bytes, sd + 12, 4, "US-ASCII")
        w = bb.getShort(sd + 8 + 32).toInt & 0xffff
        h = bb.getShort(sd + 8 + 34).toInt & 0xffff
        // child boxes past the fixed 86-byte VisualSampleEntry: the
        // decoder-config extradata (avcC) when the entry carries one
        entrySize = bb.getInt(sd + 8)
        extradata = if (entrySize > 94 && sd + 8 + entrySize <= sde)
          findBox(bytes, sd + 8 + 86, sd + 8 + entrySize, "avcC").map {
            case (cs, ce) => java.util.Arrays.copyOfRange(bytes, cs, ce)
          }
        else None
        (tt, _) <- findBox(bytes, st, ste, "stts")
        nFrames = bb.getInt(tt + 8)
        delta = bb.getInt(tt + 12).toLong & 0xffffffffL
        if nFrames > 0
        (sz, sze) <- findBox(bytes, st, ste, "stsz")
        uniform = bb.getInt(sz + 4)
        // bounds-check BEFORE materializing anything: a corrupt stts
        // count with a nonzero uniform size must return None, not
        // allocate nFrames elements (OutOfMemoryError escapes the
        // Exception catch — found in review)
        sizes <- if (uniform != 0) {
          if (uniform > 0 && nFrames.toLong * uniform <= bytes.length)
            Some(IndexedSeq.fill(nFrames)(uniform))
          else None
        } else if (bb.getInt(sz + 8) == nFrames &&
            sz + 12 + 4L * nFrames <= sze)
          Some((0 until nFrames).map(i => bb.getInt(sz + 12 + 4 * i)))
        else None
        if sizes.forall(_ > 0)
        (co, _) <- findBox(bytes, st, ste, "stco")
        off = bb.getInt(co + 8)
        if off >= 0 && off + sizes.map(_.toLong).sum <= bytes.length
      } yield {
        val offs = sizes.scanLeft(off.toLong)(_ + _)
        VideoSamples(codec, w, h, timescale, delta,
          (0 until nFrames).map(i => java.util.Arrays.copyOfRange(bytes,
            offs(i).toInt, offs(i + 1).toInt)), extradata)
      }
    } catch { case _: Exception => None }
  }

  /** the identity "codec": a `'raw '` sample IS its w×h luma plane */
  object RawLumaDecoder extends FrameDecoder {
    val codecs: Set[String] = Set("raw ")
    def decodeLuma(sample: Array[Byte], width: Int,
        height: Int): Option[Array[Byte]] =
      Some(sample).filter(_.length == width * height)
  }

  /** MJPEG (r15 verdict task 5): a `'jpeg'` sample entry means every
    * sample is a complete baseline-JPEG image — the classic
    * MJPEG-in-MP4/QuickTime layout — and the JDK decodes JPEG natively
    * ([[ImageCodec]]), so this closes a real slice of the
    * compressed-video seam with zero new dependencies. Each decoded
    * sample converts to the same w×h 8-bit luma plane the raw track
    * yields (integer BT.601: (299R+587G+114B)/1000, the [[PHash]]
    * weights). Structurally this IS a [[FrameDecoder]] plug-in — the
    * proof the seam contract is the right shape.
    */
  object MjpegDecoder extends FrameDecoder {
    val codecs: Set[String] = Set("jpeg")
    def decodeLuma(sample: Array[Byte], width: Int,
        height: Int): Option[Array[Byte]] =
      ImageCodec.decodeImage(sample).filter(img =>
        img.getWidth == width && img.getHeight == height)
        .map { img =>
          val luma = new Array[Byte](width * height)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val rgb = img.getRGB(x, y)
              luma(y * width + x) = ((299 * ((rgb >> 16) & 0xff) +
                587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000)
                .toByte
              x += 1
            }
            y += 1
          }
          luma
        }
  }

  /** the decoder stack the engine ships: raw luma + MJPEG (JDK
    * codecs) + the spec-derived intra-only H.264 decoder
    * ([[graft.llm.h264.H264Decoder]] — all-intra avc1/avc3 streams
    * with in-band parameter sets; inter prediction and CABAC remain
    * the [[FrameDecoder]] library seam)
    */
  val decoders: Seq[FrameDecoder] =
    Seq(RawLumaDecoder, MjpegDecoder, h264.H264Decoder.AvcIntraDecoder)

  /** codec dispatch over demuxed samples: the first decoder claiming
    * the track's 4cc decodes every sample; a track with any failing
    * sample is rejected whole (None), never served truncated. This is
    * the ONLY place sample bytes meet a codec — every operator above it
    * consumes [[VideoTrack]] luma planes and never sees the 4cc.
    */
  def decodeTrack(vs: VideoSamples,
      available: Seq[FrameDecoder] = decoders): Option[VideoTrack] =
    available.find(_.codecs(vs.codec)).flatMap { d =>
      // a throwing normalize (malformed extradata) rejects the track
      // whole, like a failing sample
      scala.util.Try(d.normalizeSamples(vs.samples, vs.extradata))
        .toOption.flatMap { normalized =>
          val frames = normalized.map(d.decodeLuma(_, vs.width, vs.height))
          if (frames.forall(_.isDefined))
            Some(VideoTrack(vs.width, vs.height, vs.timescale,
              vs.frameDelta, frames.map(_.get)))
          else None
        }
    }

  /** the raw-luma track decode — [[decodeTrack]] restricted to the
    * identity codec; None for any compressed sample entry
    */
  def decodeFrames(bytes: Array[Byte]): Option[VideoTrack] =
    demuxVideo(bytes).flatMap(decodeTrack(_, Seq(RawLumaDecoder)))

  /** the MJPEG track decode — [[decodeTrack]] restricted to the JDK
    * JPEG plug-in; None when any sample fails to decode or mismatches
    * the declared dimensions
    */
  def decodeMjpegFrames(bytes: Array[Byte]): Option[VideoTrack] =
    demuxVideo(bytes).flatMap(decodeTrack(_, Seq(MjpegDecoder)))

  /** every codec the shipped stack can decode, one entry point — what
    * [[graft.llm.Multimodal]]'s frame operators call
    */
  def decodeAnyFrames(bytes: Array[Byte]): Option[VideoTrack] =
    demuxVideo(bytes).flatMap(decodeTrack(_))

  private def box(tpe: String, content: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + content.length)
    bb.putInt(8 + content.length).put(tpe.getBytes("US-ASCII"))
      .put(content)
    bb.array()
  }

  private def ftypBox: Array[Byte] = box("ftyp",
    "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
      "isomiso2".getBytes("US-ASCII"))

  private def mvhdContent(timescale: Int, duration: Long): Array[Byte] = {
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

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()

  /** minimal valid fixture: ftyp + moov(mvhd v0) + a tiny mdat stub —
    * real box structure, deterministic bytes, NO video track (the
    * metadata-only shape; [[decodeFrames]] correctly returns None)
    */
  def encode(timescale: Int, duration: Long,
      mdatBody: Array[Byte]): Array[Byte] =
    ftypBox ++ box("moov", box("mvhd", mvhdContent(timescale, duration))) ++
      box("mdat", mdatBody)

  /** fixture with a REAL raw-luma video track: every frame is width ×
    * height 8-bit luma bytes stored uncompressed in `mdat`, located by
    * spec-shaped stsd/stts/stsc/stsz/stco sample tables (one chunk,
    * uniform sample size). `frameDelta` is per-frame duration in
    * `timescale` units. Round-trips through [[decodeFrames]].
    */
  def encodeVideo(timescale: Int, frameW: Int, frameH: Int,
      frameDelta: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == frameW * frameH),
      "every frame must be frameW*frameH luma bytes")
    encodeTrack(timescale, frameW, frameH, frameDelta, "raw ", depth = 8,
      frames)
  }

  /** fixture with a REAL MJPEG video track: a `'jpeg'` sample entry and
    * per-sample stsz sizes (sample_size = 0 + table — the
    * variable-size-codec shape), each sample a complete baseline JPEG.
    * Round-trips through [[decodeMjpegFrames]].
    */
  def encodeVideoMjpeg(timescale: Int, frameW: Int, frameH: Int,
      frameDelta: Int, jpegSamples: Seq[Array[Byte]]): Array[Byte] = {
    require(jpegSamples.nonEmpty, "at least one JPEG sample")
    encodeTrack(timescale, frameW, frameH, frameDelta, "jpeg", depth = 24,
      jpegSamples)
  }

  /** fixture with a REAL all-intra H.264 track: an `'avc3'` sample
    * entry (the in-band parameter-set convention of ISO 14496-15) and
    * per-sample stsz sizes; every sample a complete access unit
    * (SPS + PPS + IDR slice) as [[graft.llm.h264.H264Encoder]] emits.
    * Round-trips through [[decodeAvcFrames]].
    */
  def encodeVideoAvc(timescale: Int, frameW: Int, frameH: Int,
      frameDelta: Int, accessUnits: Seq[Array[Byte]]): Array[Byte] = {
    require(accessUnits.nonEmpty, "at least one access unit")
    encodeTrack(timescale, frameW, frameH, frameDelta, "avc3", depth = 24,
      accessUnits)
  }

  /** fixture with a REAL `avc1`+`avcC` H.264 track (the OUT-OF-BAND
    * parameter-set convention most muxers emit): the sample entry
    * carries an avcC child box (SPS/PPS + NAL length size) and the
    * samples are slice-only NAL units framed at the avcC length size.
    * Round-trips through [[decodeAvcFrames]] via the
    * [[FrameDecoder.normalizeSamples]] hook.
    */
  def encodeVideoAvc1(timescale: Int, frameW: Int, frameH: Int,
      frameDelta: Int, samples: Seq[Array[Byte]],
      avccPayload: Array[Byte]): Array[Byte] = {
    require(samples.nonEmpty, "at least one sample")
    encodeTrack(timescale, frameW, frameH, frameDelta, "avc1", depth = 24,
      samples, entryExtra = box("avcC", avccPayload))
  }

  /** the H.264 track decode — [[decodeTrack]] restricted to the
    * intra-only spec decoder; None when any sample fails (inter
    * slices, CABAC, malformation) or mismatches declared dimensions
    */
  def decodeAvcFrames(bytes: Array[Byte]): Option[VideoTrack] =
    demuxVideo(bytes).flatMap(decodeTrack(_,
      Seq(h264.H264Decoder.AvcIntraDecoder)))

  // private[llm]: Mp4MetaSpec builds a stand-in compressed-codec track
  // (an 'avc1' sample entry) to prove a drop-in FrameDecoder needs no
  // operator changes
  private[llm] def encodeTrack(timescale: Int, frameW: Int, frameH: Int,
      frameDelta: Int, format: String, depth: Int,
      frames: Seq[Array[Byte]],
      entryExtra: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val duration = frames.length.toLong * frameDelta
    val uniformSize = frames.map(_.length).distinct match {
      case Seq(one) if format == "raw " => one
      case _ => 0 // per-sample size table (the variable-size shape)
    }
    val vf = u32(0) // version 0 + zero flags
    def buildMoov(mdatContentOffset: Int): Array[Byte] = {
      val tkhdContent = {
        val bb = ByteBuffer.allocate(84) // tkhd v0
        bb.putInt(0x00000007) // version 0 + enabled/in-movie/in-preview
          .putInt(0).putInt(0) // creation/modification
          .putInt(1) // track id
          .putInt(0) // reserved
          .putInt(duration.toInt)
        bb.position(bb.position() + 16) // reserved + layer/alt/volume/res
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.putInt(frameW << 16).putInt(frameH << 16) // 16.16 fixed
        bb.array()
      }
      val mdhdContent = {
        val bb = ByteBuffer.allocate(24)
        bb.putInt(0).putInt(0).putInt(0)
          .putInt(timescale).putInt(duration.toInt)
          .putShort(0x55c4.toShort) // language 'und'
          .putShort(0)
        bb.array()
      }
      val hdlrContent = vf ++ u32(0) ++ "vide".getBytes("US-ASCII") ++
        new Array[Byte](12) ++ Array[Byte](0) // empty null-term name
      val sampleEntry = {
        // VisualSampleEntry (86 fixed bytes) + optional child boxes
        // (the avcC decoder-config real muxers append)
        val bb = ByteBuffer.allocate(86 + entryExtra.length)
        bb.putInt(86 + entryExtra.length).put(format.getBytes("US-ASCII"))
        bb.position(bb.position() + 6) // reserved
        bb.putShort(1) // data_reference_index
        bb.position(bb.position() + 16) // pre_defined/reserved
        bb.putShort(frameW.toShort).putShort(frameH.toShort)
          .putInt(0x00480000).putInt(0x00480000) // 72 dpi
          .putInt(0)
          .putShort(1) // frame_count per sample
        bb.position(bb.position() + 32) // compressorname
        bb.putShort(depth.toShort) // 8 = luma plane, 24 = color codec
          .putShort(0xffff.toShort) // pre_defined -1
        if (entryExtra.nonEmpty) bb.put(entryExtra)
        bb.array()
      }
      val stszContent =
        if (uniformSize != 0) vf ++ u32(uniformSize) ++ u32(frames.length)
        else vf ++ u32(0) ++ u32(frames.length) ++
          frames.toArray.flatMap(f => u32(f.length))
      val stbl = box("stbl",
        box("stsd", vf ++ u32(1) ++ sampleEntry) ++
          box("stts", vf ++ u32(1) ++ u32(frames.length) ++ u32(frameDelta)) ++
          box("stsc", vf ++ u32(1) ++ u32(1) ++ u32(frames.length) ++ u32(1)) ++
          box("stsz", stszContent) ++
          box("stco", vf ++ u32(1) ++ u32(mdatContentOffset)))
      val mdia = box("mdia",
        box("mdhd", mdhdContent) ++ box("hdlr", hdlrContent) ++
          box("minf", stbl))
      box("moov", box("mvhd", mvhdContent(timescale, duration)) ++
        box("trak", box("tkhd", tkhdContent) ++ mdia))
    }
    // stco carries an ABSOLUTE file offset; moov's size doesn't depend
    // on the offset value (fixed-width u32), so build once to size it,
    // then rebuild with the real offset
    val ftyp = ftypBox
    val moovSize = buildMoov(0).length
    val moov = buildMoov(ftyp.length + moovSize + 8)
    ftyp ++ moov ++ box("mdat", frames.flatten.toArray)
  }
}
