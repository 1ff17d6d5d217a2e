package graft.llm.h264

import graft.llm.FrameDecoder

/** Intra-only H.264 decoder (ITU-T Rec. H.264, public spec): NAL →
  * RBSP → SPS/PPS → IDR I-slice → CAVLC macroblocks (I_PCM,
  * Intra_16x16, Intra_4x4) → dequant + integer inverse transform →
  * intra prediction → in-loop deblocking → the luma plane the
  * [[graft.llm.FrameDecoder]] contract wants.
  *
  * SCOPE (documented, enforced by rejection — None, never a wrong
  * frame): I slices only (an all-intra stream, the archival/intra
  * profile family — nal_unit_type 1 inter slices reject), CAVLC only
  * (entropy_coding_mode_flag == 1 rejects), frame_mbs_only, 4:2:0,
  * 8-bit, no slice groups, dimensions multiples of 16 with no
  * cropping. Chroma residuals are PARSED (bitstream sync + nC
  * contexts) but not reconstructed — the contract outputs luma only.
  * Inter prediction (P/B slices, motion compensation) and CABAC
  * remain the genuine library seam documented at [[graft.llm.FrameDecoder]]:
  * this decoder narrows that seam to the parts of the codec a pure-JVM
  * build can cover honestly (see H264Tables for the conformance
  * caveat on two VLC sub-tables).
  *
  * Reference-behavior provenance: the reference engine ships no video
  * decode of its own (it delegates to OS codec frameworks); this
  * module exists for the training-pipeline media path (SURVEY §2.11
  * multimodal row), not as a port of reference code.
  */
object H264Decoder {

  final case class Sps(spsId: Int, profileIdc: Int, levelIdc: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      widthMbs: Int, heightMbs: Int, frameMbsOnly: Boolean,
      cropped: Boolean,
      /** pocType 1 only: whether slice headers omit delta_pic_order_cnt */
      deltaPocAlwaysZero: Boolean = true)

  final case class Pps(ppsId: Int, spsId: Int, cabac: Boolean,
      bottomFieldPresent: Boolean, picInitQp: Int,
      deblockCtrlPresent: Boolean, constrainedIntra: Boolean,
      sliceGroups: Int, redundantPicCntPresent: Boolean = false)

  /** split one demuxed MP4 sample into NAL payloads. The MP4-native
    * 4-byte length framing is tried FIRST and accepted only when it
    * consumes the sample exactly; otherwise the bytes are re-read as
    * Annex-B start codes. (r18 review: a start-code sniff misfires on
    * length-framed samples whose first NAL is 256–511 bytes — the
    * length field 00 00 01 xx IS a start-code prefix — so exact-consume
    * framing is the disambiguator, biased toward the framing every
    * demuxed sample actually uses.)
    */
  def splitNals(sample: Array[Byte]): Seq[Array[Byte]] = {
    val framed =
      try {
        val nals = splitAt(sample, 4)
        if (nals.nonEmpty) Some(nals) else None
      } catch { case _: H264Malformed => None }
    framed.getOrElse {
      // Annex-B: scan 00 00 01 start codes
      val out = Vector.newBuilder[Array[Byte]]
      var i = 0
      var start = -1
      while (i + 2 < sample.length) {
        if (sample(i) == 0 && sample(i + 1) == 0 && sample(i + 2) == 1) {
          if (start >= 0) {
            var end = i
            while (end > start && sample(end - 1) == 0) end -= 1
            out += java.util.Arrays.copyOfRange(sample, start, end)
          }
          start = i + 3
          i += 3
        } else i += 1
      }
      if (start >= 0 && start < sample.length)
        out += java.util.Arrays.copyOfRange(sample, start, sample.length)
      val nals = out.result()
      if (nals.isEmpty) throw new H264Malformed("no NAL framing recognized")
      nals
    }
  }

  def parseSps(rbsp: Array[Byte]): Sps = {
    val br = new BitReader(rbsp)
    val profileIdc = br.u(8)
    br.u(8) // constraint flags + reserved
    val levelIdc = br.u(8)
    val spsId = br.ue()
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profileIdc)) {
      val chromaFormat = br.ue()
      if (chromaFormat != 1) throw new H264Malformed("chroma_format != 4:2:0")
      if (br.ue() != 0) throw new H264Malformed("bit_depth_luma != 8")
      if (br.ue() != 0) throw new H264Malformed("bit_depth_chroma != 8")
      br.flag() // qpprime_y_zero_transform_bypass
      if (br.flag()) throw new H264Malformed("scaling matrices unsupported")
    }
    val log2MaxFrameNum = br.ue() + 4
    if (log2MaxFrameNum > 16) throw new H264Malformed("log2_max_frame_num")
    val pocType = br.ue()
    if (pocType > 2) throw new H264Malformed("poc type")
    var log2MaxPocLsb = 0
    if (pocType == 0) {
      log2MaxPocLsb = br.ue() + 4
      if (log2MaxPocLsb > 16) throw new H264Malformed("log2_max_poc_lsb")
    }
    var deltaPocAlwaysZero = true
    if (pocType == 1) {
      deltaPocAlwaysZero = br.flag()
      br.se(); br.se()
      val n = br.ue()
      var i = 0
      while (i < n) { br.se(); i += 1 }
    }
    br.ue() // max_num_ref_frames
    br.flag() // gaps_in_frame_num_value_allowed
    val widthMbs = br.ue() + 1
    val heightMapUnits = br.ue() + 1
    // level-limit sanity: a corrupted SPS must reject BEFORE any
    // dimension-sized allocation (the spec's highest level caps a
    // picture at 36864 MBs; 1024 MBs a side is beyond any level)
    if (widthMbs > 1024 || heightMapUnits > 1024 ||
        widthMbs.toLong * heightMapUnits > 36864L)
      throw new H264Malformed("SPS dimensions beyond level limits")
    val frameMbsOnly = br.flag()
    if (!frameMbsOnly) throw new H264Malformed("interlace unsupported")
    br.flag() // direct_8x8_inference
    val cropping = br.flag()
    if (cropping) { br.ue(); br.ue(); br.ue(); br.ue() }
    Sps(spsId, profileIdc, levelIdc, log2MaxFrameNum, pocType,
      log2MaxPocLsb, widthMbs, heightMapUnits, frameMbsOnly, cropping,
      deltaPocAlwaysZero)
  }

  def parsePps(rbsp: Array[Byte]): Pps = {
    val br = new BitReader(rbsp)
    val ppsId = br.ue()
    val spsId = br.ue()
    val cabac = br.flag()
    val bottomField = br.flag()
    val sliceGroups = br.ue() + 1
    if (sliceGroups != 1) throw new H264Malformed("slice groups unsupported")
    br.ue(); br.ue() // num_ref_idx_l0/l1_default_active
    br.flag() // weighted_pred
    br.u(2) // weighted_bipred_idc
    val picInitQp = 26 + br.se()
    br.se() // pic_init_qs
    br.se() // chroma_qp_index_offset (chroma recon skipped)
    val deblockCtrl = br.flag()
    val constrainedIntra = br.flag()
    val redundantPresent = br.flag() // redundant_pic_cnt_present
    // optional PPS tail (r18 review: High-profile PPSes append it; a
    // silent skip would desync the MB layer, so 8x8 transform and
    // scaling matrices REJECT explicitly like CABAC does)
    if (br.moreRbspData()) {
      if (br.flag()) throw new H264Malformed("8x8 transform unsupported")
      if (br.flag()) throw new H264Malformed("PPS scaling matrices unsupported")
      br.se() // second_chroma_qp_index_offset (chroma recon skipped)
    }
    Pps(ppsId, spsId, cabac, bottomField, picInitQp, deblockCtrl,
      constrainedIntra, sliceGroups, redundantPresent)
  }

  /** luma 4x4 block decode order inside an MB → (x, y) pixel offsets
    * (§6.4.3 inverse 4x4 luma block scan)
    */
  private[h264] val blkPos: Array[(Int, Int)] = Array(
    (0, 0), (4, 0), (0, 4), (4, 4), (8, 0), (12, 0), (8, 4), (12, 4),
    (0, 8), (4, 8), (0, 12), (4, 12), (8, 8), (12, 8), (8, 12), (12, 12))

  /** mutable per-picture decode state */
  private[h264] final class Pic(val sps: Sps) {
    val w: Int = sps.widthMbs * 16
    val h: Int = sps.heightMbs * 16
    val plane = new Array[Byte](w * h)
    val bw: Int = w / 4
    val bh: Int = h / 4
    // per-4x4-luma-block state
    val decoded = new Array[Boolean](bw * bh)
    val lumaTc = new Array[Int](bw * bh)
    val i4Mode = Array.fill(bw * bh)(-1)
    // per-2x2... chroma 4x4 blocks live on an 8-pixel grid (per comp)
    val cbw: Int = w / 8
    val cbh: Int = h / 8
    val chromaTc: Array[Array[Int]] =
      Array.ofDim[Int](2, cbw * cbh)
    val chromaDec: Array[Array[Boolean]] =
      Array.ofDim[Boolean](2, cbw * cbh)
    // per-MB state
    val mbW: Int = sps.widthMbs
    val mbH: Int = sps.heightMbs
    val mbQp = new Array[Int](mbW * mbH)
    val mbSlice = Array.fill(mbW * mbH)(-1)
    var nDecodedMbs = 0
    // deblock parameters from the (last) slice header
    var deblockIdc = 0
    var offA = 0
    var offB = 0
  }

  private[h264] def lumaNc(p: Pic, bx: Int, by: Int, slice: Int): Int = {
    def tc(x: Int, y: Int): Int = {
      if (x < 0 || y < 0 || x >= p.bw || y >= p.bh) -1
      else {
        val i = y * p.bw + x
        val mb = (y / 4) * p.mbW + (x / 4)
        if (!p.decoded(i) || p.mbSlice(mb) != slice) -1 else p.lumaTc(i)
      }
    }
    val nA = tc(bx - 1, by); val nB = tc(bx, by - 1)
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA
    else if (nB >= 0) nB
    else 0
  }

  private[h264] def chromaNc(p: Pic, comp: Int, cx: Int, cy: Int, slice: Int): Int = {
    def tc(x: Int, y: Int): Int = {
      if (x < 0 || y < 0 || x >= p.cbw || y >= p.cbh) -1
      else {
        val i = y * p.cbw + x
        val mb = (y / 2) * p.mbW + (x / 2)
        if (!p.chromaDec(comp)(i) || p.mbSlice(mb) != slice) -1
        else p.chromaTc(comp)(i)
      }
    }
    val nA = tc(cx - 1, cy); val nB = tc(cx, cy - 1)
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA
    else if (nB >= 0) nB
    else 0
  }

  /** is luma 4x4 block (bx, by) an available neighbor for intra
    * prediction from `slice`?
    */
  private[h264] def blkAvail(p: Pic, bx: Int, by: Int, slice: Int): Boolean =
    bx >= 0 && by >= 0 && bx < p.bw && by < p.bh && {
      val mb = (by / 4) * p.mbW + (bx / 4)
      p.decoded(by * p.bw + bx) && p.mbSlice(mb) == slice
    }

  private[h264] def sample(p: Pic, x: Int, y: Int): Int =
    p.plane(y * p.w + x) & 0xff

  /** reference bundle for the 4x4 block whose top-left pixel is
    * (px, py), with §8.3.1.2 top-right substitution
    */
  private[h264] def ref4(p: Pic, px: Int, py: Int, slice: Int): H264Pred.Ref4 = {
    val bx = px / 4; val by = py / 4
    val availTop = blkAvail(p, bx, by - 1, slice)
    val availLeft = blkAvail(p, bx - 1, by, slice)
    val availCorner = blkAvail(p, bx - 1, by - 1, slice)
    val top = new Array[Int](8)
    val left = new Array[Int](4)
    if (availTop) {
      var i = 0
      while (i < 4) { top(i) = sample(p, px + i, py - 1); i += 1 }
      if (blkAvail(p, bx + 1, by - 1, slice)) {
        while (i < 8) { top(i) = sample(p, px + i, py - 1); i += 1 }
      } else {
        while (i < 8) { top(i) = top(3); i += 1 }
      }
    }
    if (availLeft) {
      var i = 0
      while (i < 4) { left(i) = sample(p, px - 1, py + i); i += 1 }
    }
    val corner = if (availCorner) sample(p, px - 1, py - 1) else 0
    H264Pred.Ref4(top, left, corner, availTop, availLeft, availCorner)
  }

  private[h264] def ref16(p: Pic, mbX: Int, mbY: Int, slice: Int): H264Pred.Ref16 = {
    val px = mbX * 16; val py = mbY * 16
    // MB-level availability == availability of every 4x4 block along
    // that side (whole MBs decode atomically, so the corner block of
    // the side suffices)
    val availTop = blkAvail(p, px / 4, py / 4 - 1, slice)
    val availLeft = blkAvail(p, px / 4 - 1, py / 4, slice)
    val availCorner = blkAvail(p, px / 4 - 1, py / 4 - 1, slice)
    val top = new Array[Int](16)
    val left = new Array[Int](16)
    if (availTop) { var i = 0; while (i < 16) { top(i) = sample(p, px + i, py - 1); i += 1 } }
    if (availLeft) { var i = 0; while (i < 16) { left(i) = sample(p, px - 1, py + i); i += 1 } }
    val corner = if (availCorner) sample(p, px - 1, py - 1) else 0
    H264Pred.Ref16(top, left, corner, availTop, availLeft, availCorner)
  }

  /** scan-order → raster-order coefficient remap */
  private[h264] def scanToRaster(scan: Array[Int], acOnly: Boolean): Array[Int] = {
    val out = new Array[Int](16)
    val off = if (acOnly) 1 else 0
    var k = 0
    while (k < scan.length) {
      out(H264Tables.zigZag4x4(k + off)) = scan(k)
      k += 1
    }
    out
  }

  /** decode one macroblock_layer (§7.3.5, I slices) */
  private[h264] def decodeMb(br: BitReader, p: Pic, pps: Pps, mbAddr: Int,
      slice: Int, qpRef: Array[Int]): Unit = {
    val mbX = mbAddr % p.mbW; val mbY = mbAddr / p.mbW
    val px = mbX * 16; val py = mbY * 16
    val bx0 = px / 4; val by0 = py / 4
    // a second decode of the same address means overlapping slices —
    // the nDecodedMbs completeness check would otherwise double-count
    // and could bless a picture with never-decoded holes (r18 review)
    if (p.mbSlice(mbAddr) != -1)
      throw new H264Malformed(s"MB $mbAddr decoded twice")
    // slice membership is established BEFORE block decode: nC contexts
    // and intra availability for earlier blocks of THIS MB must see it
    p.mbSlice(mbAddr) = slice
    val mbType = br.ue()

    def markLuma(tcGrid: Int => Int): Unit = {
      var b = 0
      while (b < 16) {
        val (ox, oy) = blkPos(b)
        val gi = (by0 + oy / 4) * p.bw + (bx0 + ox / 4)
        p.lumaTc(gi) = tcGrid(b)
        p.decoded(gi) = true
        b += 1
      }
    }
    def markChroma(tcOf: (Int, Int) => Int): Unit = {
      var comp = 0
      while (comp < 2) {
        var b = 0
        while (b < 4) {
          val gi = (mbY * 2 + b / 2) * p.cbw + (mbX * 2 + b % 2)
          p.chromaTc(comp)(gi) = tcOf(comp, b)
          p.chromaDec(comp)(gi) = true
          b += 1
        }
        comp += 1
      }
    }

    if (mbType == 25) {
      // ---- I_PCM (§7.3.5, §8.3.5) ----
      br.alignToByte()
      var i = 0
      while (i < 256) {
        p.plane((py + i / 16) * p.w + px + (i % 16)) = br.alignedByte().toByte
        i += 1
      }
      i = 0
      while (i < 128) { br.alignedByte(); i += 1 } // chroma samples, unused
      markLuma(_ => 16)
      markChroma((_, _) => 16)
      p.mbQp(mbAddr) = 0 // §8.7.2: I_PCM filters at QPy 0
      p.nDecodedMbs += 1
      return
    }

    if (mbType > 25) throw new H264Malformed(s"I-slice mb_type $mbType")

    if (mbType == 0) {
      // ---- Intra_4x4 ----
      val modes = new Array[Int](16)
      // pred-mode elements arrive in block decode order; derivation
      // (§8.3.1.1) reads neighbor modes, so record them as we go
      val mbModes = new Array[Int](16) // per block-order index
      var b = 0
      while (b < 16) {
        val (ox, oy) = blkPos(b)
        val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
        // §8.3.1.1: neighbor modes come from PARSED state — a left/top
        // neighbor inside this MB always precedes b in block order and
        // carries its mode even though its samples reconstruct later
        def nbMode(x: Int, y: Int): Int =
          if (x < 0 || y < 0 || x >= p.bw || y >= p.bh) 2
          else if (x / 4 == mbX && y / 4 == mbY) {
            val m = p.i4Mode(y * p.bw + x)
            if (m < 0) 2 else m
          } else if (!blkAvail(p, x, y, slice)) 2
          else {
            val m = p.i4Mode(y * p.bw + x)
            if (m < 0) 2 else m // non-I4x4 neighbor MB → DC
          }
        val predMode = math.min(nbMode(gbx - 1, gby), nbMode(gbx, gby - 1))
        val mode =
          if (br.flag()) predMode
          else {
            val rem = br.u(3)
            if (rem < predMode) rem else rem + 1
          }
        mbModes(b) = mode
        modes(b) = mode
        // mark the MODE now (the derivation needs it) but NOT the
        // sample-decoded flag — recon marks that per block below
        p.i4Mode(gby * p.bw + gbx) = mode
        b += 1
      }
      val chromaMode = br.ue()
      if (chromaMode > 3) throw new H264Malformed("chroma pred mode")
      val cbpCode = br.ue()
      if (cbpCode >= 48) throw new H264Malformed("cbp code")
      val cbp = H264Tables.cbpIntra(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      if (cbp != 0) {
        val d = br.se()
        if (d < -26 || d > 25) throw new H264Malformed("mb_qp_delta")
        qpRef(0) = (qpRef(0) + d + 52) % 52
      }
      val qp = qpRef(0)
      // decode + reconstruct per block, in block order
      b = 0
      while (b < 16) {
        val (ox, oy) = blkPos(b)
        val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
        val pred = H264Pred.pred4x4(mbModes(b), ref4(p, px + ox, py + oy, slice))
        val coded = (cbpLuma & (1 << (b / 4))) != 0
        var tcHere = 0
        val recon: Array[Int] =
          if (coded) {
            val nC = lumaNc(p, gbx, gby, slice)
            val blk = H264Cavlc.decodeBlock(br, nC, 16)
            tcHere = blk.totalCoeff
            val ras = scanToRaster(blk.coeffs, acOnly = false)
            val res = H264Transform.inverse4x4(
              H264Transform.dequant4x4(ras, qp, dcBypass = false))
            Array.tabulate(16)(i => H264Transform.clip255(pred(i) + res(i)))
          } else pred
        var i = 0
        while (i < 16) {
          p.plane((py + oy + i / 4) * p.w + px + ox + (i % 4)) =
            recon(i).toByte
          i += 1
        }
        val gi = gby * p.bw + gbx
        p.lumaTc(gi) = tcHere
        p.decoded(gi) = true
        b += 1
      }
      decodeChroma(br, p, mbX, mbY, cbpChroma, slice)
      p.mbQp(mbAddr) = qp
      p.nDecodedMbs += 1
      return
    }

    // ---- Intra_16x16 (mb_type 1..24; Table 7-11) ----
    val t = mbType - 1
    val predMode16 = t % 4
    val cbpChroma = (t / 4) % 3
    val cbpLuma = if (t >= 12) 15 else 0
    val chromaMode = br.ue()
    if (chromaMode > 3) throw new H264Malformed("chroma pred mode")
    val d = br.se()
    if (d < -26 || d > 25) throw new H264Malformed("mb_qp_delta")
    qpRef(0) = (qpRef(0) + d + 52) % 52
    val qp = qpRef(0)
    val pred = H264Pred.pred16x16(predMode16, ref16(p, mbX, mbY, slice))
    // luma DC: nC of block 0, 16 coefficients in zig-zag over the DC grid
    val dcNc = lumaNc(p, bx0, by0, slice)
    val dcBlk = H264Cavlc.decodeBlock(br, dcNc, 16)
    val dcRaster = scanToRaster(dcBlk.coeffs, acOnly = false)
    val dc = H264Transform.lumaDc(dcRaster, qp)
    // AC blocks in block order; the grid marks as we go (nC contexts)
    val tcArr = new Array[Int](16)
    var b = 0
    while (b < 16) {
      val (ox, oy) = blkPos(b)
      val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
      val dcIdx = (oy / 4) * 4 + (ox / 4) // DC grid is raster over blocks
      val ras: Array[Int] =
        if (cbpLuma != 0) {
          val nC = lumaNc(p, gbx, gby, slice)
          val blk = H264Cavlc.decodeBlock(br, nC, 15)
          tcArr(b) = blk.totalCoeff
          scanToRaster(blk.coeffs, acOnly = true)
        } else new Array[Int](16)
      ras(0) = dc(dcIdx)
      val deq = H264Transform.dequant4x4(ras, qp, dcBypass = true)
      val res = H264Transform.inverse4x4(deq)
      var i = 0
      while (i < 16) {
        val pi = (oy + i / 4) * 16 + ox + (i % 4)
        p.plane((py + oy + i / 4) * p.w + px + ox + (i % 4)) =
          H264Transform.clip255(pred(pi) + res(i)).toByte
        i += 1
      }
      val gi = gby * p.bw + gbx
      p.lumaTc(gi) = tcArr(b)
      p.decoded(gi) = true
      b += 1
    }
    decodeChroma(br, p, mbX, mbY, cbpChroma, slice)
    p.mbQp(mbAddr) = qp
    p.mbSlice(mbAddr) = slice
    p.nDecodedMbs += 1
  }

  /** chroma residual parse (§7.3.5.3.2) — coefficients advance the
    * bitstream and feed the nC grids; no chroma reconstruction (luma
    * output only)
    */
  private def decodeChroma(br: BitReader, p: Pic, mbX: Int, mbY: Int,
      cbpChroma: Int, slice: Int): Unit = {
    if ((cbpChroma & 3) != 0) {
      var comp = 0
      while (comp < 2) {
        H264Cavlc.decodeBlock(br, -1, 4) // chroma DC, nC = −1
        comp += 1
      }
    }
    val tcOf = Array.ofDim[Int](2, 4)
    if ((cbpChroma & 2) != 0) {
      var comp = 0
      while (comp < 2) {
        var b = 0
        while (b < 4) {
          val cx = mbX * 2 + b % 2; val cy = mbY * 2 + b / 2
          val nC = chromaNc(p, comp, cx, cy, slice)
          val blk = H264Cavlc.decodeBlock(br, nC, 15)
          tcOf(comp)(b) = blk.totalCoeff
          b += 1
        }
        comp += 1
      }
    }
    var comp = 0
    while (comp < 2) {
      var b = 0
      while (b < 4) {
        val gi = (mbY * 2 + b / 2) * p.cbw + (mbX * 2 + b % 2)
        p.chromaTc(comp)(gi) = tcOf(comp)(b)
        p.chromaDec(comp)(gi) = true
        b += 1
      }
      comp += 1
    }
  }

  /** decode one access unit (a demuxed avc1/avc3 sample with in-band
    * SPS/PPS) to its luma plane; None on anything outside the
    * documented scope or any malformation
    */
  def decodeIdrLuma(sampleBytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeIdrLumaUnsafe(sampleBytes)
    catch {
      case _: H264Malformed | _: H264BitstreamEnd |
          _: ArrayIndexOutOfBoundsException | _: NoSuchElementException |
          _: NegativeArraySizeException =>
        None
    }

  /** [[decodeIdrLuma]] without the rejection boundary — spec diagnosis
    * only (lets a test see WHICH malformation fired)
    */
  private[llm] def decodeIdrLumaUnsafe(
      sampleBytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    {
      val nals = splitNals(sampleBytes)
      var spsMap = Map.empty[Int, Sps]
      var ppsMap = Map.empty[Int, Pps]
      var pic: Pic = null
      var sliceIdx = 0
      nals.foreach { nal =>
        if (nal.length < 1) throw new H264Malformed("empty NAL")
        if (((nal(0) >> 7) & 1) != 0) throw new H264Malformed("forbidden bit")
        val nalType = nal(0) & 0x1f
        nalType match {
          case 7 =>
            val sps = parseSps(Rbsp.unescape(nal, 1))
            spsMap += sps.spsId -> sps
          case 8 =>
            val pps = parsePps(Rbsp.unescape(nal, 1))
            if (pps.cabac) throw new H264Malformed("CABAC unsupported")
            ppsMap += pps.ppsId -> pps
          case 5 =>
            val rbsp = Rbsp.unescape(nal, 1)
            val br = new BitReader(rbsp)
            val firstMb = br.ue()
            val sliceType = br.ue()
            if (sliceType % 5 != 2) // 2/7 = I
              throw new H264Malformed(s"non-I slice type $sliceType")
            val ppsId = br.ue()
            val pps = ppsMap.getOrElse(ppsId,
              throw new H264Malformed(s"unknown PPS $ppsId"))
            val sps = spsMap.getOrElse(pps.spsId,
              throw new H264Malformed(s"unknown SPS ${pps.spsId}"))
            if (sps.cropped) throw new H264Malformed("cropping unsupported")
            br.u(sps.log2MaxFrameNum) // frame_num
            br.ue() // idr_pic_id
            if (sps.pocType == 0) {
              br.u(sps.log2MaxPocLsb)
              if (pps.bottomFieldPresent) br.se()
            } else if (sps.pocType == 1 && !sps.deltaPocAlwaysZero) {
              br.se() // delta_pic_order_cnt[0]
              if (pps.bottomFieldPresent) br.se() // delta_pic_order_cnt[1]
            }
            if (pps.redundantPicCntPresent) br.ue() // redundant_pic_cnt
            // dec_ref_pic_marking (IDR): two flags when nal_ref_idc != 0
            if (((nal(0) >> 5) & 3) != 0) { br.flag(); br.flag() }
            val qpDelta = br.se()
            var idc = 0; var offA = 0; var offB = 0
            if (pps.deblockCtrlPresent) {
              idc = br.ue()
              if (idc > 2) throw new H264Malformed("deblock idc")
              if (idc != 1) { offA = 2 * br.se(); offB = 2 * br.se() }
            }
            if (pic == null) {
              pic = new Pic(sps)
              pic.deblockIdc = idc; pic.offA = offA; pic.offB = offB
            } else {
              if (pic.sps != sps)
                throw new H264Malformed("SPS changed mid-picture")
              // the post-pass filter applies ONE parameter set to the
              // picture; slices that disagree would need per-MB params
              // (r18 review: last-slice-wins silently misfiltered)
              if (pic.deblockIdc != idc || pic.offA != offA ||
                  pic.offB != offB)
                throw new H264Malformed("per-slice deblock params differ")
            }
            val qpRef = Array((pps.picInitQp + qpDelta + 52) % 52)
            var mbAddr = firstMb
            val total = pic.mbW * pic.mbH
            var more = true
            while (more) {
              if (mbAddr >= total) throw new H264Malformed("MB overflow")
              decodeMb(br, pic, pps, mbAddr, sliceIdx, qpRef)
              mbAddr += 1
              more = br.moreRbspData() && mbAddr < total
            }
            sliceIdx += 1
          case 1 =>
            throw new H264Malformed("inter slice (the library seam)")
          case _ => // SEI / AUD / filler: skip
        }
      }
      if (pic == null || pic.nDecodedMbs != pic.mbW * pic.mbH) None
      else {
        H264Deblock.filterPlane(pic.plane, pic.w, pic.h,
          (x, y) => pic.mbQp(y * pic.mbW + x),
          (x, y) => pic.mbSlice(y * pic.mbW + x),
          pic.deblockIdc, pic.offA, pic.offB)
        Some((pic.w, pic.h, pic.plane))
      }
    }

  /** parsed `avcC` decoder configuration (ISO 14496-15): the NAL
    * length-field size the track's samples use, plus the out-of-band
    * SPS/PPS NAL units
    */
  final case class AvcConfig(lengthSize: Int, sps: Seq[Array[Byte]],
      pps: Seq[Array[Byte]])

  /** parse an avcC box payload; throws [[H264Malformed]] on framing
    * errors (a malformed config rejects the whole track upstream)
    */
  def parseAvcc(avcc: Array[Byte]): AvcConfig = {
    if (avcc.length < 7 || (avcc(0) & 0xff) != 1)
      throw new H264Malformed("avcC version")
    val lengthSize = (avcc(4) & 3) + 1
    var pos = 5
    def u8(): Int = {
      if (pos >= avcc.length) throw new H264Malformed("avcC truncated")
      val v = avcc(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = (u8() << 8) | u8()
    def nal(): Array[Byte] = {
      val len = u16()
      if (len <= 0 || pos + len > avcc.length)
        throw new H264Malformed("avcC NAL length")
      val out = java.util.Arrays.copyOfRange(avcc, pos, pos + len)
      pos += len
      out
    }
    val nSps = u8() & 0x1f
    val sps = Seq.fill(nSps)(nal())
    val nPps = u8()
    val pps = Seq.fill(nPps)(nal())
    AvcConfig(lengthSize, sps, pps)
  }

  private def framed4(nals: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { n =>
      out.write((n.length >> 24) & 0xff); out.write((n.length >> 16) & 0xff)
      out.write((n.length >> 8) & 0xff); out.write(n.length & 0xff)
      out.write(n, 0, n.length)
    }
    out.toByteArray
  }

  /** split a sample framed at `lengthSize`-byte NAL prefixes; throws
    * unless the framing consumes the sample EXACTLY (trailing garbage
    * is a framing error, not padding)
    */
  private def splitAt(sample: Array[Byte], lengthSize: Int): Seq[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i + lengthSize <= sample.length) {
      var len = 0
      var k = 0
      while (k < lengthSize) { len = (len << 8) | (sample(i + k) & 0xff); k += 1 }
      if (len <= 0 || i + lengthSize + len > sample.length)
        throw new H264Malformed("bad NAL length")
      out += java.util.Arrays.copyOfRange(sample, i + lengthSize,
        i + lengthSize + len)
      i += lengthSize + len
    }
    if (i != sample.length) throw new H264Malformed("NAL framing leftover")
    out.result()
  }

  /** the [[FrameDecoder]] plug-in: 'avc1'/'avc3' sample entries. In-band
    * parameter sets (the avc3 convention) decode directly; when the
    * sample entry carries an `avcC` box (the avc1 convention real
    * muxers emit), [[FrameDecoder.normalizeSamples]] re-frames each
    * sample from the avcC NAL length size to 4 bytes and prepends the
    * out-of-band SPS/PPS, making every sample self-contained.
    */
  object AvcIntraDecoder extends FrameDecoder {
    val codecs: Set[String] = Set("avc1", "avc3")

    override def normalizeSamples(samples: IndexedSeq[Array[Byte]],
        extradata: Option[Array[Byte]]): IndexedSeq[Array[Byte]] =
      extradata match {
        case None => samples
        case Some(avcc) =>
          val cfg = parseAvcc(avcc)
          val params = framed4(cfg.sps ++ cfg.pps)
          samples.map(s => params ++ framed4(splitAt(s, cfg.lengthSize)))
      }

    def decodeLuma(sample: Array[Byte], width: Int,
        height: Int): Option[Array[Byte]] =
      decodeIdrLuma(sample) match {
        case Some((w, h, plane)) if w == width && h == height => Some(plane)
        case _ => None
      }
  }
}
