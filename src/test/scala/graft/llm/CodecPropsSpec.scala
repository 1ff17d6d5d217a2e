package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** seeded property coverage for the hand-rolled codecs — these parse
  * adversarial byte layouts at 100 TB, so the round trips must hold for
  * ARBITRARY signals, not just the fixture patterns (same deterministic
  * Gen-pumping driver as TypeMapSpec: scalatestplus is not on the
  * offline classpath)
  */
class CodecPropsSpec extends AnyFunSuite {

  def forAllSeeded[T](gen: Gen[T], n: Int = 200)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(1042L + i)).foreach(check)
    }

  test("WAV round trip holds for arbitrary signals and rates") {
    val gen = for {
      n <- Gen.choose(0, 500)
      rate <- Gen.oneOf(8000, 16000, 22050, 44100, 48000)
      samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (samples.toArray, rate)
    forAllSeeded(gen) { case (samples, rate) =>
      val st = WavCodec.decode(WavCodec.encode(samples, rate)).get
      assert(st.sampleRate == rate)
      assert(st.nSamples == samples.length)
      assert(st.durationMs == samples.length.toLong * 1000 / rate)
      val expectMean =
        if (samples.isEmpty) 0.0
        else samples.map(s => math.abs(s.toLong)).sum.toDouble /
          (32768.0 * samples.length)
      assert(st.meanAbs == expectMean)
    }
  }

  test("MP4 mvhd round trip holds for arbitrary timescale/duration") {
    val gen = for {
      timescale <- Gen.choose(1, 1000000)
      duration <- Gen.choose(0L, Int.MaxValue.toLong)
      bodyLen <- Gen.choose(0, 64)
    } yield (timescale, duration, bodyLen)
    forAllSeeded(gen) { case (timescale, duration, bodyLen) =>
      val bytes = Mp4Meta.encode(timescale, duration,
        Array.fill(bodyLen)(7.toByte))
      val st = Mp4Meta.decode(bytes).get
      assert(st.timescale == timescale)
      assert(st.duration == duration)
      assert(st.durationMs == duration * 1000L / timescale)
    }
  }

  test("MP4 raw-track round trip holds for arbitrary geometry/frames") {
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 24)
      n <- Gen.choose(1, 12)
      timescale <- Gen.oneOf(600, 1000, 90000)
      delta <- Gen.choose(1, 5000)
      seed <- Gen.choose(0, 255)
    } yield (w, h, n, timescale, delta, seed)
    forAllSeeded(gen, 100) { case (w, h, n, timescale, delta, seed) =>
      val frames = (0 until n).map(f =>
        Array.tabulate(w * h)(j => ((seed + f * 31 + j * 7) % 256).toByte))
      val bytes = Mp4Meta.encodeVideo(timescale, w, h, delta, frames)
      val vt = Mp4Meta.decodeFrames(bytes).get
      assert(vt.width == w && vt.height == h)
      assert(vt.timescale == timescale && vt.frameDelta == delta)
      assert(vt.frames.length == n)
      (0 until n).foreach(f => assert(vt.frames(f).sameElements(frames(f))))
      (0 until n).foreach(f =>
        assert(vt.frameTsMs(f) == f.toLong * delta * 1000L / timescale))
      // the movie header agrees with the track
      assert(Mp4Meta.decode(bytes).get.duration == n.toLong * delta)
    }
  }

  test("truncated or corrupted payloads never crash the decoders") {
    val base = WavCodec.encode(WavCodec.testSamples(3L, 64), 16000)
    val mp4 = Mp4Meta.encode(1000, 5000L, Array.fill(16)(1.toByte))
    val png = ImageCodec.encode(ImageCodec.testImage(1L, 4, 4))
    forAllSeeded(Gen.choose(0, base.length - 1), 60) { cut =>
      WavCodec.decode(base.take(cut)) // Option, no throw
    }
    forAllSeeded(Gen.choose(0, mp4.length - 1), 60) { cut =>
      Mp4Meta.decode(mp4.take(cut))
    }
    val rawMp4 = Mp4Meta.encodeVideo(1000, 4, 3, 500,
      (0 until 3).map(f => Array.fill(12)(f.toByte)))
    forAllSeeded(Gen.choose(0, rawMp4.length - 1), 60) { cut =>
      Mp4Meta.decodeFrames(rawMp4.take(cut)) // Option, no throw
    }
    forAllSeeded(Gen.choose(0, png.length - 1), 60) { cut =>
      ImageCodec.decode(png.take(cut))
    }
    // bit flips
    val flip = for {
      idx <- Gen.choose(12, base.length - 1)
      bit <- Gen.choose(0, 7)
    } yield (idx, bit)
    forAllSeeded(flip, 100) { case (idx, bit) =>
      val b = base.clone(); b(idx) = (b(idx) ^ (1 << bit)).toByte
      WavCodec.decode(b)
    }
  }

  test("PNG tEXt splice→walk→strip round trip holds for arbitrary pairs") {
    val latin1Str = Gen.choose(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
    val gen = for {
      seed <- Gen.choose(0, 5)
      nKvs <- Gen.choose(0, 4)
      kvs <- Gen.listOfN(nKvs, Gen.zip(latin1Str, latin1Str))
    } yield (seed, kvs)
    forAllSeeded(gen, n = 60) { case (seed, kvs) =>
      val base = ImageCodec.encode(ImageCodec.gradImage(seed.toLong, 16, 12))
      val spliced = PngChunks.withText(base, kvs)
      // walk returns exactly the spliced pairs, in order
      assert(PngChunks.textChunks(spliced) == kvs)
      assert(PngChunks.textChunkCount(spliced) == kvs.size)
      // strip returns byte-identical original framing
      assert(PngChunks.stripText(spliced).sameElements(base))
      // pixels and perceptual hash unaffected by the splice
      assert(ImageCodec.decode(spliced) == ImageCodec.decode(base))
      assert(PHash.ofBytes(spliced) == PHash.ofBytes(base))
      // bit-flip robustness: corrupting any single framing byte never
      // throws, the walk just stops at the last well-formed chunk
      if (spliced.nonEmpty) {
        val idx = (seed * 7919 + kvs.size * 131) % spliced.length
        val b = spliced.clone(); b(idx) = (b(idx) ^ 0x40).toByte
        PngChunks.textChunks(b)
        PngChunks.stripText(b)
      }
    }
  }

  test("stripText passes bytes after the last well-formed chunk through " +
      "verbatim (r13 advice: truncated/trailing-junk payloads)") {
    val base = ImageCodec.encode(ImageCodec.gradImage(3L, 16, 12))
    val spliced = PngChunks.withText(base, Seq(("Software", "graft")))
    // trailing junk after IEND, too short to frame a chunk: strip must
    // remove the tEXt but keep the junk byte-for-byte
    val junk = Array[Byte](0x4a, 0x55, 0x4e, 0x4b, 0x21)
    val withJunk = spliced ++ junk
    assert(PngChunks.stripText(withJunk).sameElements(base ++ junk))
    // truncated final chunk (IEND missing its CRC): the 8 partial bytes
    // after the last well-formed chunk survive the strip
    val truncated = spliced.dropRight(4)
    assert(PngChunks.stripText(truncated).sameElements(base.dropRight(4)))
    // degenerate truncation: nothing but text chunks were well-formed —
    // the strip still keeps every unparsed byte
    assert(PngChunks.stripText(spliced).sameElements(base))
  }
}
