package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.h264._

/** Validation ladder for the intra-only H.264 codec pair (see the
  * provenance note in H264Tables — this ladder pins STRUCTURE and
  * round-trip self-consistency; external conformance bitstreams are
  * unavailable in a zero-egress build):
  *   1. structural table checks (prefix-freeness, Kraft sums,
  *      permutations, monotonicity),
  *   2. primitive round-trips (Exp-Golomb, RBSP escaping, CAVLC
  *      blocks across the nC ladder, transforms),
  *   3. whole-frame encoder→decoder bit-exact reconstruction across
  *      MB-class rotations, QPs and deblock settings,
  *   4. rejection of everything outside the documented scope.
  */
class H264Spec extends AnyFunSuite {

  // ---- 1. table structure -------------------------------------------

  private def assertPrefixFree(name: String, codes: Iterable[String]): Unit = {
    val list = codes.toSeq
    assert(list.distinct.size == list.size, s"$name: duplicate code")
    for (a <- list; b <- list if a != b)
      assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
  }

  private def kraft(codes: Iterable[String]): Double =
    codes.map(c => math.pow(2.0, -c.length)).sum

  test("coeff_token tables: 62 entries, prefix-free, Kraft <= 1") {
    for ((name, tab) <- Seq(
        ("nc0", H264Tables.coeffTokenNc0),
        ("nc2", H264Tables.coeffTokenNc2),
        ("nc4", H264Tables.coeffTokenNc4))) {
      assert(tab.size == 62, s"$name size")
      // exactly the legal (trailingOnes, totalCoeff) alphabet
      val alphabet = (0 to 16).flatMap(tc =>
        (0 to math.min(3, tc)).map(t1 => (t1, tc))).toSet
      assert(tab.keySet == alphabet, s"$name alphabet")
      assertPrefixFree(name, tab.values)
      assert(kraft(tab.values) <= 1.0 + 1e-12, s"$name Kraft")
    }
    assert(H264Tables.coeffTokenChromaDc.size == 14)
    assertPrefixFree("chromaDc", H264Tables.coeffTokenChromaDc.values)
    assert(kraft(H264Tables.coeffTokenChromaDc.values) <= 1.0 + 1e-12)
  }

  test("total_zeros / run_before tables: complete prefix codes") {
    for ((tc, codes) <- H264Tables.totalZeros4x4) {
      assert(codes.length == 17 - tc, s"total_zeros tc=$tc arity")
      assertPrefixFree(s"tz$tc", codes)
      // tc=1 is the one row the standard leaves a leaf short (its three
      // 9-bit codes leave 000000000 unused); every other row is complete
      val k = kraft(codes)
      assert(k <= 1.0 + 1e-12 && k >= 1.0 - 1.0 / 512 - 1e-12,
        s"tz$tc Kraft $k")
    }
    for ((tc, codes) <- H264Tables.totalZerosChromaDc) {
      assert(codes.length == 5 - tc, s"tzc$tc arity")
      assertPrefixFree(s"tzc$tc", codes)
      assert(math.abs(kraft(codes) - 1.0) < 1e-12, s"tzc$tc complete")
    }
    for ((zl, codes) <- H264Tables.runBefore if zl <= 6) {
      assert(codes.length == zl + 1, s"run_before zl=$zl arity")
      assertPrefixFree(s"rb$zl", codes)
      assert(math.abs(kraft(codes) - 1.0) < 1e-12, s"rb$zl complete")
    }
    assertPrefixFree("rb7", H264Tables.runBefore(7))
  }

  test("FLC coeff_token (nC >= 8): 6 bits, injective") {
    val all = for {
      tc <- 0 to 16
      t1 <- 0 to math.min(3, tc)
    } yield H264Tables.coeffTokenFlc(t1, tc)
    assert(all.forall(_.length == 6))
    assert(all.distinct.size == all.size)
  }

  test("cbp mapping is a permutation of 0..47; zig-zag of 0..15") {
    assert(H264Tables.cbpIntra.sorted == (0 to 47))
    assert(H264Tables.zigZag4x4.sorted.toSeq == (0 to 15))
    // zig-zag anti-diagonal order: scan position k visits a raster
    // cell whose (row+col) never decreases by more than 0 across k
    val diag = H264Tables.zigZag4x4.map(i => (i / 4) + (i % 4))
    assert(diag.zip(diag.tail).forall { case (a, b) => b >= a - 1 })
  }

  test("deblock tables: 52 entries, monotone nondecreasing") {
    for (t <- Seq(H264Tables.alphaTab, H264Tables.betaTab,
        H264Tables.tc0Bs3)) {
      assert(t.length == 52)
      assert(t.zip(t.tail).forall { case (a, b) => b >= a })
    }
  }

  // ---- 2. primitive round-trips -------------------------------------

  test("Exp-Golomb ue/se round-trips") {
    val bw = new BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 255, 12345)
    val ses = Seq(0, 1, -1, 2, -2, 25, -26, 400, -400)
    ues.foreach(bw.ue)
    ses.foreach(bw.se)
    bw.trailing()
    val br = new BitReader(bw.toBytes)
    ues.foreach(v => assert(br.ue() == v))
    ses.foreach(v => assert(br.se() == v))
  }

  test("RBSP escape/unescape round-trips, including planted 000001") {
    val cases = Seq(
      Array[Byte](0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0, 1),
      Array[Byte](0, 0, 0, 0, 0, 0),
      Array.tabulate(64)(i => (i % 5).toByte),
      Array[Byte](1, 2, 3))
    cases.foreach { rbsp =>
      val wire = Rbsp.escape(rbsp)
      // the wire form never contains 00 00 0x with x <= 3
      (0 until wire.length - 2).foreach { i =>
        assert(!(wire(i) == 0 && wire(i + 1) == 0 && (wire(i + 2) & 0xff) <= 2),
          s"unprotected start-code at $i")
      }
      assert(Rbsp.unescape(wire, 0).sameElements(rbsp))
    }
  }

  test("CAVLC block round-trips across the nC ladder") {
    val rnd = new scala.util.Random(7)
    for {
      nC <- Seq(-1, 0, 1, 2, 3, 4, 7, 8, 16)
      maxCoeffs <- if (nC == -1) Seq(4) else Seq(16, 15)
      trial <- 0 until 120
    } {
      val coeffs = new Array[Int](maxCoeffs)
      val n = rnd.nextInt(maxCoeffs + 1)
      // sparse fill biased toward low frequencies; magnitudes cover
      // trailing ones, small levels, and the escape ranges
      var placed = 0
      while (placed < n) {
        val pos = rnd.nextInt(maxCoeffs)
        if (coeffs(pos) == 0) {
          val mag = rnd.nextInt(10) match {
            case 0 | 1 | 2 | 3 => 1
            case 4 | 5 | 6 => 1 + rnd.nextInt(4)
            case 7 | 8 => 5 + rnd.nextInt(60)
            case _ => 100 + rnd.nextInt(1500)
          }
          coeffs(pos) = if (rnd.nextBoolean()) mag else -mag
          placed += 1
        }
      }
      val bw = new BitWriter
      val tcEnc = H264Cavlc.encodeBlock(bw, coeffs.clone(), nC, maxCoeffs)
      bw.trailing()
      val br = new BitReader(bw.toBytes)
      val blk = H264Cavlc.decodeBlock(br, nC, maxCoeffs)
      assert(blk.totalCoeff == tcEnc)
      assert(blk.coeffs.sameElements(coeffs),
        s"nC=$nC max=$maxCoeffs: ${coeffs.mkString(",")} vs ${blk.coeffs.mkString(",")}")
    }
  }

  test("inverse transform of a quantized constant block is constant") {
    for (qp <- Seq(0, 10, 20, 28, 35, 51); c <- Seq(-40, -3, 5, 77)) {
      val w = H264Transform.forward4x4(Array.fill(16)(c))
      assert(w(0) == 16 * c && w.drop(1).forall(_ == 0))
      val q = H264Transform.quant4x4(w, qp, skipDc = false)
      val r = H264Transform.inverse4x4(
        H264Transform.dequant4x4(q, qp, dcBypass = false))
      assert(r.distinct.length == 1, s"qp=$qp c=$c: ${r.mkString(",")}")
    }
  }

  test("transform round-trip error is bounded by the quantizer step") {
    val rnd = new scala.util.Random(11)
    for (qp <- Seq(0, 12, 24, 36); _ <- 0 until 50) {
      val x = Array.fill(16)(rnd.nextInt(121) - 60)
      val q = H264Transform.quant4x4(H264Transform.forward4x4(x), qp,
        skipDc = false)
      val r = H264Transform.inverse4x4(
        H264Transform.dequant4x4(q, qp, dcBypass = false))
      // Qstep doubles every 6 QP: 0.625 * 2^(qp/6); per-sample recon
      // error stays within a small multiple of Qstep (loose structural
      // bound — per-coefficient error accumulates across the 16-tap
      // inverse)
      val qstep = 0.625 * math.pow(2.0, qp / 6.0)
      val maxErr = x.zip(r).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr <= 2.0 * qstep + 2.0, s"qp=$qp maxErr=$maxErr qstep=$qstep")
    }
  }

  test("Hadamard is self-inverse up to the 16x scale") {
    val rnd = new scala.util.Random(5)
    val x = Array.fill(16)(rnd.nextInt(201) - 100)
    val hh = H264Transform.hadamard4x4(H264Transform.hadamard4x4(x))
    assert(hh.zip(x).forall { case (a, b) => a == 16 * b })
  }

  // ---- 3. whole-frame round-trips -----------------------------------

  private def synthFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h) { j =>
      val x = j % w; val y = j / w
      val v = 128.0 + 90.0 * StrictMath.sin(0.11 * x + 0.07 * y +
        0.3 * seed) * StrictMath.cos(0.05 * x - 0.09 * y - 0.2 * seed)
      H264Transform.clip255(StrictMath.round(v).toInt).toByte
    }

  test("encode→decode round-trips bit-exactly across configs") {
    val (w, h) = (64, 48)
    for {
      qp <- Seq(20, 28, 35)
      deblock <- Seq(true, false)
      (i4, pcm) <- Seq((3, 11), (0, 0), (1, 0), (0, 1))
    } {
      val src = synthFrame(w, h, qp + (if (deblock) 1 else 0) + i4)
      val cfg = H264Encoder.Cfg(qp = qp, deblock = deblock,
        i4Every = i4, pcmEvery = pcm)
      val (sample, recon) = H264Encoder.encodeFrame(src, w, h, cfg)
      val out = H264Decoder.decodeIdrLuma(sample)
      assert(out.isDefined, s"decode failed qp=$qp deblock=$deblock i4=$i4 pcm=$pcm")
      val (dw, dh, plane) = out.get
      assert(dw == w && dh == h)
      assert(plane.sameElements(recon),
        s"recon mismatch qp=$qp deblock=$deblock i4=$i4 pcm=$pcm")
    }
  }

  test("multi-slice frames round-trip; cross-slice availability holds") {
    val (w, h) = (64, 48) // 3 MB rows
    val src = synthFrame(w, h, 6)
    for ((rows, across) <- Seq((1, true), (1, false), (2, true))) {
      val cfg = H264Encoder.Cfg(qp = 26, mbRowsPerSlice = rows,
        deblockAcrossSlices = across)
      val (sample, recon) = H264Encoder.encodeFrame(src, w, h, cfg)
      // one IDR NAL per slice
      val nSlices = H264Decoder.splitNals(sample)
        .count(n => (n(0) & 0x1f) == 5)
      assert(nSlices == (h / 16 + rows - 1) / rows, s"rows=$rows")
      val out = H264Decoder.decodeIdrLuma(sample)
      assert(out.isDefined, s"rows=$rows across=$across")
      assert(out.get._3.sameElements(recon), s"rows=$rows across=$across")
    }
    // idc 2 vs idc 0 differ exactly at slice-boundary edges: with
    // per-row slices the frames must not be byte-identical (the
    // boundary rows carry quantization steps the filter would smooth)
    val (_, withCross) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 38, mbRowsPerSlice = 1, deblockAcrossSlices = true))
    val (_, noCross) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 38, mbRowsPerSlice = 1, deblockAcrossSlices = false))
    assert(!withCross.sameElements(noCross))
  }

  test("slice-header POC variants and redundant_pic_cnt round-trip") {
    val (w, h) = (32, 32)
    val src = synthFrame(w, h, 12)
    for {
      pocType <- Seq(0, 1, 2)
      redundant <- Seq(false, true)
    } {
      val (sample, recon) = H264Encoder.encodeFrame(src, w, h,
        H264Encoder.Cfg(qp = 26, pocType = pocType,
          redundantPicCnt = redundant))
      val out = H264Decoder.decodeIdrLuma(sample)
      assert(out.isDefined, s"poc=$pocType redundant=$redundant")
      assert(out.get._3.sameElements(recon),
        s"poc=$pocType redundant=$redundant")
    }
  }

  test("PPS tail: benign tail accepted, 8x8/scaling-matrix tails reject") {
    def ppsWithTail(t8x8: Boolean, scaling: Boolean): Array[Byte] = {
      val bw = new BitWriter
      bw.ue(0); bw.ue(0) // pps_id, sps_id
      bw.flag(false); bw.flag(false) // cavlc, bottom_field
      bw.ue(0) // slice groups
      bw.ue(0); bw.ue(0)
      bw.flag(false); bw.u(0, 2)
      bw.se(0); bw.se(0); bw.se(0)
      bw.flag(true); bw.flag(false); bw.flag(false)
      bw.flag(t8x8) // transform_8x8_mode_flag
      bw.flag(scaling) // pic_scaling_matrix_present_flag
      bw.se(0) // second_chroma_qp_index_offset
      bw.trailing()
      bw.toBytes
    }
    // benign tail (all features off): parses clean
    val pps = H264Decoder.parsePps(ppsWithTail(t8x8 = false, scaling = false))
    assert(!pps.cabac && pps.deblockCtrlPresent)
    intercept[H264Malformed] {
      H264Decoder.parsePps(ppsWithTail(t8x8 = true, scaling = false))
    }
    intercept[H264Malformed] {
      H264Decoder.parsePps(ppsWithTail(t8x8 = false, scaling = true))
    }
  }

  test("spliced adversarial slice layouts reject as None") {
    val (w, h) = (32, 48) // 3 MB rows
    val src = synthFrame(w, h, 14)
    def nalsOf(cfg: H264Encoder.Cfg): Seq[Array[Byte]] =
      H264Decoder.splitNals(H264Encoder.encodeFrame(src, w, h, cfg)._1)
    def frame4(nals: Seq[Array[Byte]]): Array[Byte] =
      nals.toArray.flatMap(n => Array[Byte](
        ((n.length >> 24) & 0xff).toByte, ((n.length >> 16) & 0xff).toByte,
        ((n.length >> 8) & 0xff).toByte, (n.length & 0xff).toByte) ++ n)
    val perRow = nalsOf(H264Encoder.Cfg(qp = 30, mbRowsPerSlice = 1))
    val Seq(sps, pps, s0, s1, s2) = perRow
    // overlapping slices (same first_mb twice) must reject, even though
    // the decodeMb call count reaches the picture total
    assert(H264Decoder.decodeIdrLuma(frame4(Seq(sps, pps, s0, s0, s1)))
      .isEmpty)
    // a coverage hole rejects too
    assert(H264Decoder.decodeIdrLuma(frame4(Seq(sps, pps, s0, s2))).isEmpty)
    // slices disagreeing on deblock parameters reject (the post-pass
    // filter applies ONE parameter set; last-slice-wins would misfilter)
    val noDbk = nalsOf(H264Encoder.Cfg(qp = 30, mbRowsPerSlice = 1,
      deblock = false))
    assert(H264Decoder.decodeIdrLuma(
      frame4(Seq(sps, pps, s0, noDbk(3), s2))).isEmpty)
    // the intact per-row set still decodes (the splice harness is sound)
    assert(H264Decoder.decodeIdrLuma(frame4(perRow)).isDefined)
  }

  test("length-framed sample whose first NAL is 256-511 bytes decodes") {
    val (w, h) = (32, 16)
    val src = synthFrame(w, h, 16)
    val (sample, recon) = H264Encoder.encodeFrame(src, w, h)
    // prepend a 300-byte SEI NAL: its 4-byte length prefix is
    // 00 00 01 2C — exactly the byte shape a start-code sniff would
    // misread as Annex-B (r18 review); strict exact-consume framing
    // must keep the sample length-framed
    val sei = Array.fill(300)(0x33.toByte)
    sei(0) = 0x06 // nal_unit_type 6 (SEI), nal_ref_idc 0
    val framed = Array[Byte](0, 0, 1, 44) ++ sei ++ sample
    val out = H264Decoder.decodeIdrLuma(framed)
    assert(out.isDefined && out.get._3.sameElements(recon))
  }

  test("Annex-B framing decodes identically to length-prefixed") {
    val (w, h) = (32, 32)
    val src = synthFrame(w, h, 8)
    val (sample, recon) = H264Encoder.encodeFrame(src, w, h)
    val nals = H264Decoder.splitNals(sample)
    val annexB = nals.toArray.flatMap(n =>
      Array[Byte](0, 0, 0, 1) ++ n)
    val Some((_, _, plane)) = H264Decoder.decodeIdrLuma(annexB)
    assert(plane.sameElements(recon))
    // decode is deterministic: two decodes agree byte-for-byte
    val Some((_, _, p2)) = H264Decoder.decodeIdrLuma(sample)
    assert(plane.sameElements(p2))
  }

  test("I_PCM-only frames are lossless") {
    val (w, h) = (32, 32)
    val src = synthFrame(w, h, 3)
    val (sample, recon) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 30, deblock = false, i4Every = 0, pcmEvery = 1))
    assert(recon.sameElements(src))
    val Some((_, _, plane)) = H264Decoder.decodeIdrLuma(sample)
    assert(plane.sameElements(src))
  }

  test("reconstruction tracks the source (distortion sanity)") {
    val (w, h) = (64, 48)
    val src = synthFrame(w, h, 9)
    val (_, recon) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 20, deblock = true))
    val mae = src.zip(recon).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / src.length
    assert(mae < 6.0, s"qp20 mean abs err $mae")
    // compression actually happened (not PCM everywhere): sample is
    // much smaller than the raw plane for this low-detail content
    val (sample, _) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 28, deblock = true, pcmEvery = 0))
    assert(sample.length < w * h / 2, s"sample ${sample.length}")
  }

  test("deblocking changes MB-edge samples and nothing at flat regions") {
    val (w, h) = (48, 32)
    // flat frame at the DC-prediction neutral value 128: every
    // residual is exactly zero (the first MB's DC predictor with no
    // neighbors is 128), recon is flat, and the filter must be a no-op
    val flat = Array.fill(w * h)(128.toByte)
    val (_, reconFlatOn) = H264Encoder.encodeFrame(flat, w, h,
      H264Encoder.Cfg(qp = 30, deblock = true, pcmEvery = 0))
    val (_, reconFlatOff) = H264Encoder.encodeFrame(flat, w, h,
      H264Encoder.Cfg(qp = 30, deblock = false, pcmEvery = 0))
    assert(reconFlatOn.sameElements(reconFlatOff))
    // textured frame at coarse QP: the filter must move SOME samples
    val src = synthFrame(w, h, 4)
    val (_, on) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 38, deblock = true, pcmEvery = 0))
    val (_, off) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 38, deblock = false, pcmEvery = 0))
    assert(!on.sameElements(off))
  }

  test("deblock filter line honors the alpha gate and tc clamp") {
    // direct property on the spec formulas via a one-MB-edge frame is
    // implicit above; here pin the α gate: a step larger than α(51)=255
    // cannot occur in 8-bit, so craft indexA low instead
    val (w, h) = (32, 16)
    val left = 30; val right = 200 // |p0-q0| = 170 >= alpha at low QP
    val src = Array.tabulate(w * h)(j =>
      (if (j % w < 16) left else right).toByte)
    val (_, on) = H264Encoder.encodeFrame(src, w, h,
      H264Encoder.Cfg(qp = 16, deblock = true, i4Every = 0, pcmEvery = 1))
    // PCM everywhere keeps recon == src pre-filter; at qp 16 the PCM
    // MBs filter at QPav 0 → alpha 0 → no edge filtering at all
    assert(on.sameElements(src))
  }

  // ---- 4. scope rejection -------------------------------------------

  test("out-of-scope and malformed streams reject as None") {
    val (w, h) = (32, 16)
    val src = synthFrame(w, h, 2)
    val (sample, _) = H264Encoder.encodeFrame(src, w, h)
    // truncation at every eighth byte boundary
    Seq(4, sample.length / 3, sample.length / 2, sample.length - 2)
      .foreach { cut =>
        assert(H264Decoder.decodeIdrLuma(sample.take(cut)).isEmpty ||
          cut >= sample.length, s"truncated at $cut decoded")
      }
    // bit corruption in the slice payload must either reject or decode
    // to SOME frame — never throw out of the decodeLuma boundary; the
    // fuzz sweep covers the single-slice, multi-slice and PCM-heavy
    // stream shapes (each exercises different parse machinery)
    val rnd = new scala.util.Random(3)
    val shapes = Seq(
      sample,
      H264Encoder.encodeFrame(src, w, h,
        H264Encoder.Cfg(qp = 30, mbRowsPerSlice = 1,
          deblockAcrossSlices = false))._1,
      H264Encoder.encodeFrame(src, w, h,
        H264Encoder.Cfg(qp = 30, i4Every = 0, pcmEvery = 1))._1)
    shapes.foreach { base =>
      (0 until 200).foreach { _ =>
        val mutated = base.clone()
        val i = rnd.nextInt(mutated.length - 20) + 20
        mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
        H264Decoder.decodeIdrLuma(mutated) // must not throw
      }
    }
    // dimension mismatch via the FrameDecoder contract
    assert(H264Decoder.AvcIntraDecoder.decodeLuma(sample, w + 16, h).isEmpty)
    assert(H264Decoder.AvcIntraDecoder.decodeLuma(sample, w, h).isDefined)
    // an inter (non-IDR) NAL rejects: nal_unit_type 1
    val interNal = Array[Byte](0x41, 0x00)
    val framed = Array[Byte](0, 0, 0, 2) ++ interNal
    assert(H264Decoder.decodeIdrLuma(framed).isEmpty)
  }

  // ---- 5. MP4 integration -------------------------------------------

  test("avc1+avcC track (out-of-band SPS/PPS, 2-byte NAL lengths) decodes") {
    val (w, h) = (64, 48)
    val frames = (0 until 3).map(f => synthFrame(w, h, f + 20))
    val qp = 26
    val encoded = frames.map(fr =>
      H264Encoder.encodeFrame(fr, w, h, H264Encoder.Cfg(qp = qp)))
    // the avc1 convention: parameter sets in the sample entry's avcC,
    // samples slice-only, NALs framed at the avcC length size (2 here,
    // exercising the re-framing path — in-band samples use 4)
    val lengthSize = 2
    val avcc = H264Encoder.avccPayload(w / 16, h / 16, qp, lengthSize)
    val samples = encoded.map(e =>
      H264Encoder.toAvc1Sample(e._1, lengthSize))
    // sanity: the avc1 samples genuinely carry no SPS/PPS
    samples.foreach { s =>
      assert(H264Decoder.decodeIdrLuma(s).isEmpty,
        "slice-only sample must not decode without the avcC params")
    }
    val clip = Mp4Meta.encodeVideoAvc1(timescale = 1000, frameW = w,
      frameH = h, frameDelta = 500, samples = samples, avccPayload = avcc)
    // demux surfaces the extradata; the normalize hook rebuilds
    // self-contained units and the track decodes to the closed-loop recon
    val Some(vs) = Mp4Meta.demuxVideo(clip)
    assert(vs.codec == "avc1" && vs.extradata.isDefined)
    val Some(vt) = Mp4Meta.decodeAvcFrames(clip)
    assert(vt.frames.length == 3)
    vt.frames.zip(encoded.map(_._2)).foreach { case (got, exp) =>
      assert(got.sameElements(exp))
    }
    // the generic stack path too
    assert(Mp4Meta.decodeAnyFrames(clip).isDefined)
    // a corrupted avcC rejects the track whole (no partial serving)
    val badAvcc = avcc.clone(); badAvcc(0) = 9
    val badClip = Mp4Meta.encodeVideoAvc1(1000, w, h, 500, samples, badAvcc)
    assert(Mp4Meta.decodeAvcFrames(badClip).isEmpty)
  }

  test("avc3 MP4 track round-trips through the shipped decoder stack") {
    val (w, h) = (64, 48)
    val frames = (0 until 4).map(f => synthFrame(w, h, f))
    val encoded = frames.map(fr =>
      H264Encoder.encodeFrame(fr, w, h, H264Encoder.Cfg(qp = 24)))
    val clip = Mp4Meta.encodeVideoAvc(timescale = 1000, frameW = w,
      frameH = h, frameDelta = 500, accessUnits = encoded.map(_._1))
    // dedicated entry point
    val Some(vt) = Mp4Meta.decodeAvcFrames(clip)
    assert(vt.width == w && vt.height == h && vt.frames.length == 4)
    vt.frames.zip(encoded.map(_._2)).foreach { case (got, exp) =>
      assert(got.sameElements(exp))
    }
    // the generic stack dispatches off the 4cc with zero extra wiring
    val Some(vt2) = Mp4Meta.decodeAnyFrames(clip)
    assert(vt2.frames.length == 4)
    vt2.frames.zip(vt.frames).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    // the raw-luma-only entry point correctly refuses the avc3 entry
    assert(Mp4Meta.decodeFrames(clip).isEmpty)
  }
}
