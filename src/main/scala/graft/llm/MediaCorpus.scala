package graft.llm

import org.apache.spark.sql.{Encoders, SparkSession}

/** sf-proportional synthetic media corpus for the main bench staging
  * (r13 verdict task 7: the media family priced on real sf-scale rows
  * instead of the 31-row fixture's job floor, with the oracle twins
  * racing the SAME staged table).
  *
  * Same discipline as the committed fixture ([[Multimodal.mediaRows]])
  * run at scale: every payload is a REAL container (PNG through the
  * JDK encoder, RIFF/PCM WAV, raw-luma ISO BMFF), and every "authored"
  * expected column (phash64, audiofp64, fr_phash64, px_brightness,
  * amp_mean, rs8x6 stats, tEXt pairs, strip digest) is computed at
  * staging time by the engine's own extractors from the same bytes —
  * the x12 decode-the-encoded rule. The oracle queries read those
  * columns; the engine re-derives them from the payload, so the search
  * phases (x81/x83/x85/x86/x91) race the twin on identical inputs
  * while the decode phases remain Spark-only capability claims.
  *
  * Corpus composition (deterministic per id, splitmix64 streams):
  *   - 20% planted near-dup variants (id ≡ 4 mod 5 varies id−1):
  *     brightness-shifted PNG re-encodes, gain-halved WAV re-masters,
  *     trimmed 5-frame clip prefixes — the x80/x82/x85 invariance
  *     classes at the MediaBench plant rate.
  *   - quality-drop classes at ~8.7% (id mod 23 ∈ {1,2}): under/over-
  *     exposed images, near-silent and hard-clipped audio; trimmed
  *     clips double as the too-short class (2.5 s < MinClipMs) — every
  *     x88/x91 gate rule fires on real rows.
  *   - tEXt-bearing PNGs at ~9% (id ≡ 3 mod 11, non-variants): real
  *     CRC32-framed chunks via [[PngChunks.withText]], so x89/x90 walk
  *     actual container framing at scale.
  *   - hard-cut clips at ~6% (id ≡ 1 mod 17, non-variants): two texture
  *     families at shifted luma centers, so x87 detects real scene
  *     boundaries.
  *
  * Generation is one `mapPartitions` over `spark.range` — no shuffle,
  * no driver materialization; at 100 TB this is exactly how a synthetic
  * load harness authors its corpus.
  */
object MediaCorpus {

  /** splitmix64 — the deterministic per-id parameter stream (public
    * Steele/Lea/Flood PRNG, same recipe as [[graft.MediaBench]])
    */
  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def unif(seed: Long, k: Int): Double =
    (mix(seed * 1000003L + k) >>> 11).toDouble / (1L << 53).toDouble

  val W = 64
  val H = 48

  /** id-parameterized smooth-texture luma plane (frame `f`); six
    * id-derived sinusoid coefficients spread the DCT spectrum
    */
  private def lumaFrame(seed: Long, f: Int): Array[Byte] = {
    val a = 0.5 + 3.0 * unif(seed, 1)
    val b = 0.5 + 3.0 * unif(seed, 2)
    val c = 2.0 * unif(seed, 3) - 1.0
    val d = 2.0 * unif(seed, 4) - 1.0
    val e = 2.0 * unif(seed, 5) - 1.0
    val phi = 2.0 * StrictMath.PI * unif(seed, 6)
    val tau = 2.0 * StrictMath.PI
    Array.tabulate(W * H) { j =>
      val fx = (j % W).toDouble / (W - 1)
      val fy = (j / W).toDouble / (H - 1)
      val v = StrictMath.sin(tau * (a * fx + b * fy + c * fx * fy +
        d * fx * fx + e * fy * fy) + phi + 0.35 * f)
      val i0 = StrictMath.round(128.0 + 110.0 * v).toInt
      (if (i0 < 0) 0 else if (i0 > 255) 255 else i0).toByte
    }
  }

  /** ids ≡ 4 (mod 5) are near-dup variants of id−1 (≡ 3, so variants
    * never chain) — the 20% planted duplicate rate
    */
  @inline private def baseOf(id: Long): (Long, Boolean) =
    if (id % 5 == 4) (id - 1, true) else (id, false)

  /** image pixel plane for a LOCAL id, with the exposure class applied
    * (id ≡ 1 mod 23 → squeezed dark, ≡ 2 → squeezed bright); a variant
    * id inherits its base's class and shifts +6 — the x80 invariance
    */
  private def imagePixels(id: Long): Array[Byte] = {
    val (base, variant) = baseOf(id)
    val lum = lumaFrame(base, 0)
    val (lo, hi) = (base % 23) match {
      case 1 => (0, 38)    // under-exposed: brightness < ExposureLo
      case 2 => (235, 255) // over-exposed: brightness > ExposureHi
      case _ => (0, 255)
    }
    val shift = if (variant) 6 else 0
    lum.map { b =>
      val v0 = lo + (b & 0xff) * (hi - lo) / 255
      math.min(255, v0 + shift).toByte
    }
  }

  def pngFor(id: Long): Array[Byte] = {
    val px = imagePixels(id)
    val img = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var j = 0
    while (j < W * H) {
      val v = px(j) & 0xff
      img.setRGB(j % W, j / W, (v << 16) | (v << 8) | v)
      j += 1
    }
    val bytes = ImageCodec.encode(img)
    if (id % 5 != 4 && id % 11 == 3)
      PngChunks.withText(bytes, textPairsFor(id))
    else bytes
  }

  /** the provenance strings x89/x90 audit — two pairs per planted row */
  private def textPairsFor(id: Long): Seq[(String, String)] = Seq(
    "Software" -> s"graftcam ${1 + (id % 7)}.${id % 10}",
    "Comment" -> s"synthetic corpus row $id")

  /** 0.5 s 16 kHz three-tone WAV for a LOCAL id; id ≡ 1 mod 23 is
    * near-silent (gate: amp_mean < SilenceAmp), ≡ 2 is a hard-clipped
    * square of the mix (gate: amp_mean > HotAmp — literal clipping);
    * variants re-master the base at half gain — the x82 invariance
    */
  def wavFor(id: Long): Array[Byte] = {
    val (base, variant) = baseOf(id)
    val rate = 16000
    val f1 = 200.0 + 1800.0 * unif(base, 11)
    val f2 = 200.0 + 1800.0 * unif(base, 12)
    val f3 = 200.0 + 1800.0 * unif(base, 13)
    val cls = base % 23
    val gain = (if (variant) 0.5 else 1.0) * (if (cls == 1) 0.02 else 1.0)
    val tau = 2.0 * StrictMath.PI
    val samples = Array.tabulate(8000) { t =>
      val tt = t.toDouble / rate
      val v = 0.5 * StrictMath.sin(tau * f1 * tt) +
        0.3 * StrictMath.sin(tau * f2 * tt) +
        0.2 * StrictMath.sin(tau * f3 * tt)
      if (cls == 2) (if (v >= 0) 30000 else -30000).toShort
      else (gain * v * 12000.0).toShort
    }
    WavCodec.encode(samples, rate)
  }

  /** 8-frame raw-luma MP4 clip for a LOCAL id; variants are the TRIMMED
    * 5-frame prefix (x85 containment AND the too-short quality class:
    * 2.5 s < MinClipMs); id ≡ 1 mod 17 is a hard-cut clip — two texture
    * families at ±45 luma, the x87 scene boundary
    */
  def mp4For(id: Long): Array[Byte] = {
    val (base, variant) = baseOf(id)
    val seed = mix(base) ^ 0x56494445L
    val baseFrames =
      if (base % 17 == 1) {
        (0 until 4).map(f => lumaFrame(seed, f).map(v =>
          math.min(255, (v & 0xff) + 45).toByte)) ++
          (0 until 4).map(f => lumaFrame(mix(seed), f).map(v =>
            math.max(0, (v & 0xff) - 45).toByte))
      } else (0 until 8).map(f => lumaFrame(seed, f))
    // a variant is the trimmed PREFIX of its base's actual frames (a
    // cut base keeps its boundary inside the prefix), so containment
    // holds for every planted pair by construction
    val frames = if (variant) baseFrames.take(5) else baseFrames
    // id ≡ 7 mod 19 (decided on the BASE id, so a planted variant stays
    // in its base's codec and frame-hash containment remains exact):
    // MJPEG clip — every sample a real JDK-encoded JPEG behind a 'jpeg'
    // sample entry + per-sample stsz table, so x92's decode path prices
    // at corpus scale
    if (base % 19 == 7)
      Mp4Meta.encodeVideoMjpeg(timescale = 1000, frameW = W, frameH = H,
        frameDelta = 500,
        jpegSamples = frames.map(fr =>
          ImageCodec.encodeJpeg(ImageCodec.grayImage(fr, W, H))))
    else if (base % 19 == 11) {
      // all-intra H.264 clip class (r18): every sample a complete
      // SPS+PPS+IDR access unit behind an 'avc3' entry, so x94 and the
      // codec-agnostic frame operators price the spec decoder at corpus
      // scale. Encoder config varies with the BASE id (QP / deblock /
      // MB-class rotation); a trimmed variant re-encodes the same
      // source frames all-intra, so its per-frame recon — and hash
      // containment — is exact by construction.
      val cfg = graft.llm.h264.H264Encoder.Cfg(
        qp = 22 + (base % 3).toInt * 4, deblock = base % 2 == 0)
      Mp4Meta.encodeVideoAvc(timescale = 1000, frameW = W, frameH = H,
        frameDelta = 500,
        accessUnits = frames.map(fr =>
          graft.llm.h264.H264Encoder.encodeFrame(fr, W, H, cfg)._1))
    } else
      Mp4Meta.encodeVideo(timescale = 1000, frameW = W, frameH = H,
        frameDelta = 500, frames = frames)
  }

  /** full fixture-schema row for a global media_id: payload + every
    * authored expected column, computed by the engine's own extractors
    * from the encoded bytes (the fixture authoring rule at scale)
    */
  private def imageRow(gid: Long, id: Long): Multimodal.MediaFx = {
    val bytes = pngFor(id)
    val Some((dw, dh, bright)) = ImageCodec.decode(bytes): @unchecked
    val (rb, rm) = Multimodal.rs8x6(bytes)
    val kvs =
      if (id % 5 != 4 && id % 11 == 3) Some(textPairsFor(id)) else None
    Multimodal.MediaFx(gid, "image", bytes, Some(dw), Some(dh), None, None,
      Some(bright), None, rb, rm, None, None, PHash.ofBytes(bytes), None,
      None,
      txt_keys = kvs.map(_.map(_._1)), txt_vals = kvs.map(_.map(_._2)),
      stripped_md5 =
        kvs.map(_ => Multimodal.md5OfHex(PngChunks.stripText(bytes))))
  }

  private def audioRow(gid: Long, id: Long): Multimodal.MediaFx = {
    val bytes = wavFor(id)
    val st = WavCodec.decode(bytes).get
    Multimodal.MediaFx(gid, "audio", bytes, None, None, Some(st.durationMs),
      Some(st.sampleRate), None, Some(st.meanAbs), None, None, None, None,
      None, AudioFp.ofBytes(bytes), None)
  }

  private def videoRow(gid: Long, id: Long): Multimodal.MediaFx = {
    val bytes = mp4For(id)
    val vs = Mp4Meta.demuxVideo(bytes).get // demux once, not per branch
    val vt = Mp4Meta.decodeTrack(vs).get
    val codecTag = vs.codec match {
      case "jpeg" => Some("mjpeg")
      case "avc3" | "avc1" => Some("avc")
      case _ => None // raw luma: the uncompressed class carries no tag
    }
    Multimodal.MediaFx(gid, "video", bytes, Some(vt.width), Some(vt.height),
      Some(Mp4Meta.decode(bytes).get.durationMs), None, None, None, None,
      None, Some(vt.frames.indices.map(vt.frameTsMs)),
      Some(vt.frames.map(fr => fr.map(_ & 0xff).sum.toDouble / fr.length)),
      None, None,
      Some(vt.frames.map(fr => PHash.ofLuma(fr, vt.width, vt.height))),
      codec = codecTag)
  }

  /** media_id offsets giving each modality a DISJOINT id space; offsets
    * are multiples of 5 so the id%5==4 planted-variant rule survives
    */
  def offsets(nImg: Long): (Long, Long) = {
    def up5(x: Long) = (x + 4) / 5 * 5
    val audOff = up5(nImg)
    (audOff, audOff + up5(math.max(8L, nImg / 4)))
  }

  /** write the corpus as one parquet table (fixture schema): nImg
    * images, nImg/4 WAVs, nImg/8 clips — one shuffle-free generate +
    * author pass per modality
    */
  def write(spark: SparkSession, out: String, nImg: Long): Unit = {
    val nAud = math.max(8L, nImg / 4)
    val nVid = math.max(8L, nImg / 8)
    val (audOff, vidOff) = offsets(nImg)
    val enc = Encoders.product[Multimodal.MediaFx]
    val parts = math.min(32L, math.max(1L, nImg / 256L)).toInt
    spark.range(0, nImg, 1, parts).map(id => imageRow(id, id))(enc).toDF()
      .unionByName(spark.range(0, nAud, 1, parts)
        .map(id => audioRow(audOff + id, id))(enc).toDF())
      .unionByName(spark.range(0, nVid, 1, parts)
        .map(id => videoRow(vidOff + id, id))(enc).toDF())
      .write.mode("overwrite").parquet(out)
    // recipe stamp: Bench.ensureMedia force-restages a staged corpus
    // whose recipe no longer matches (the staged dir name carries no
    // version, so a generator change would otherwise silently serve
    // stale content across rounds)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, ".recipe"), RecipeVersion)
    ()
  }

  /** bump when the generated corpus content changes (r16: MJPEG clip
    * class at base ≡ 7 mod 19 + the codec column; r18: all-intra
    * H.264 clip class at base ≡ 11 mod 19)
    */
  val RecipeVersion = "3"
}
