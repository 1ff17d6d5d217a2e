package graft.llm.h264

/** Fixture encoder: produces conforming all-intra H.264 access units
  * (SPS + PPS + one IDR I-slice per frame, in-band — the avc3
  * convention) that [[H264Decoder]] decodes, plus the closed-loop
  * reconstruction the fixtures store as the expected luma plane.
  *
  * This is an AUTHORING tool, not a rate-distortion encoder: macroblock
  * classes rotate deterministically (Intra_16x16 / Intra_4x4 / I_PCM)
  * so every decode path — all nine 4x4 modes, the four 16x16 modes,
  * luma DC + AC CAVLC across the nC context ladder, chroma DC/AC
  * parse, PCM alignment — appears in a small corpus. The quantizer is
  * flat (one QP per frame) and mode choice is availability-filtered
  * rotation, not cost search.
  *
  * Closed loop: the encoder reconstructs through the DECODER'S OWN
  * dequant + inverse transform + prediction ([[H264Transform]] /
  * [[H264Pred]] — the same objects the decoder calls), so its recon
  * equals the decode output bit-for-bit; H264Spec gates that equality
  * per frame and the media fixtures store this recon as the expected
  * frame content (the decode-the-encoded-bytes authoring rule).
  */
object H264Encoder {
  import H264Decoder.{Pic, Sps, blkPos, ref4, ref16, lumaNc, chromaNc}

  final case class Cfg(
      qp: Int = 28,
      deblock: Boolean = true,
      /** every n-th MB is Intra_4x4 (0 disables) */
      i4Every: Int = 3,
      /** every n-th MB is I_PCM (0 disables) */
      pcmEvery: Int = 11,
      /** plant chroma DC / DC+AC residuals on a rotation (parse-path
        * exercise; chroma recon is out of the luma contract)
        */
      chromaResidue: Boolean = true,
      /** MB rows per slice (0 = one slice per picture). Multi-slice
        * frames exercise cross-slice availability: intra prediction
        * and nC contexts must treat other-slice neighbors as absent
        */
      mbRowsPerSlice: Int = 0,
      /** with deblock on: false writes idc 2 (slice-boundary edges
        * unfiltered) — only meaningful with mbRowsPerSlice > 0
        */
      deblockAcrossSlices: Boolean = true,
      /** pic_order_cnt_type (0/1/2) — exercises the slice-header POC
        * field variants (type 1 authored with
        * delta_pic_order_always_zero_flag = 0, the parse-heavy shape)
        */
      pocType: Int = 2,
      /** PPS redundant_pic_cnt_present_flag + the slice-header field */
      redundantPicCnt: Boolean = false)

  private def nalBytes(header: Int, rbsp: Array[Byte]): Array[Byte] =
    Array(header.toByte) ++ Rbsp.escape(rbsp)

  private def lenPrefixed(nals: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { n =>
      out.write((n.length >> 24) & 0xff); out.write((n.length >> 16) & 0xff)
      out.write((n.length >> 8) & 0xff); out.write(n.length & 0xff)
      out.write(n, 0, n.length)
    }
    out.toByteArray
  }

  def spsRbsp(widthMbs: Int, heightMbs: Int,
      pocType: Int = 2): Array[Byte] = {
    val bw = new BitWriter
    bw.u(66, 8) // profile_idc: Baseline
    bw.u(0xc0, 8) // constraint_set0+1, reserved zero
    bw.u(20, 8) // level_idc 2.0
    bw.ue(0) // sps_id
    bw.ue(0) // log2_max_frame_num_minus4
    bw.ue(pocType) // pic_order_cnt_type
    if (pocType == 0) bw.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    else if (pocType == 1) {
      bw.flag(false) // delta_pic_order_always_zero (slice fields PRESENT)
      bw.se(0); bw.se(0) // offset_for_non_ref_pic / top_to_bottom
      bw.ue(0) // num_ref_frames_in_pic_order_cnt_cycle
    }
    bw.ue(1) // max_num_ref_frames
    bw.flag(false) // gaps_in_frame_num
    bw.ue(widthMbs - 1)
    bw.ue(heightMbs - 1)
    bw.flag(true) // frame_mbs_only
    bw.flag(true) // direct_8x8_inference
    bw.flag(false) // frame_cropping
    bw.flag(false) // vui_parameters_present
    bw.trailing()
    bw.toBytes
  }

  def ppsRbsp(qp: Int, redundantPicCnt: Boolean = false): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // pps_id
    bw.ue(0) // sps_id
    bw.flag(false) // entropy_coding_mode: CAVLC
    bw.flag(false) // bottom_field_pic_order_present
    bw.ue(0) // num_slice_groups_minus1
    bw.ue(0); bw.ue(0) // num_ref_idx defaults
    bw.flag(false) // weighted_pred
    bw.u(0, 2) // weighted_bipred_idc
    bw.se(qp - 26) // pic_init_qp_minus26
    bw.se(0) // pic_init_qs
    bw.se(0) // chroma_qp_index_offset
    bw.flag(true) // deblocking_filter_control_present
    bw.flag(false) // constrained_intra_pred
    bw.flag(redundantPicCnt) // redundant_pic_cnt_present
    bw.trailing()
    bw.toBytes
  }

  /** encode one frame; returns (MP4-sample bytes: length-prefixed
    * SPS+PPS+IDR NALs, closed-loop luma recon). Dimensions must be
    * multiples of 16.
    */
  def encodeFrame(src: Array[Byte], w: Int, h: Int,
      cfg: Cfg = Cfg()): (Array[Byte], Array[Byte]) = {
    require(w % 16 == 0 && h % 16 == 0, "dims must be multiples of 16")
    require(src.length == w * h)
    require(cfg.qp >= 0 && cfg.qp <= 51)
    val mbW = w / 16; val mbH = h / 16
    val sps = H264Decoder.parseSps(spsRbsp(mbW, mbH, cfg.pocType))
    val pic = new Pic(sps)
    val qp = cfg.qp
    val total = mbW * mbH
    // disable_deblocking_filter_idc: 1 when off, else 2 when slice
    // boundaries must not be crossed (the multi-slice exercise), else 0
    val idc =
      if (!cfg.deblock) 1 else if (cfg.deblockAcrossSlices) 0 else 2

    def encodeSlice(bw: BitWriter, slice: Int, startMb: Int,
        endMb: Int): Unit = {
    // slice header
    bw.ue(startMb) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices of the picture are I)
    bw.ue(0) // pps_id
    bw.u(0, 4) // frame_num (log2_max_frame_num = 4)
    bw.ue(0) // idr_pic_id
    if (cfg.pocType == 0) bw.u(0, 4) // pic_order_cnt_lsb
    else if (cfg.pocType == 1) bw.se(0) // delta_pic_order_cnt[0]
    if (cfg.redundantPicCnt) bw.ue(0) // redundant_pic_cnt
    bw.flag(false); bw.flag(false) // dec_ref_pic_marking (IDR)
    bw.se(0) // slice_qp_delta
    bw.ue(idc) // disable_deblocking_filter_idc
    if (idc != 1) { bw.se(0); bw.se(0) } // alpha/beta offsets

    var mbAddr = startMb
    while (mbAddr < endMb) {
      val mbX = mbAddr % mbW; val mbY = mbAddr / mbW
      val px = mbX * 16; val py = mbY * 16
      val bx0 = px / 4; val by0 = py / 4
      // mirror the decoder: slice membership first, so nC contexts and
      // intra availability see earlier blocks of THIS MB
      pic.mbSlice(mbAddr) = slice
      val isPcm = cfg.pcmEvery > 0 && mbAddr % cfg.pcmEvery == cfg.pcmEvery - 1
      val isI4 = !isPcm && cfg.i4Every > 0 && mbAddr % cfg.i4Every == 0

      def writePlane(ox: Int, oy: Int, vals: Array[Int], side: Int): Unit = {
        var i = 0
        while (i < side * side) {
          pic.plane((py + oy + i / side) * w + px + ox + (i % side)) =
            vals(i).toByte
          i += 1
        }
      }
      def srcBlock(ox: Int, oy: Int, side: Int): Array[Int] =
        Array.tabulate(side * side)(i =>
          src((py + oy + i / side) * w + px + ox + (i % side)) & 0xff)

      if (isPcm) {
        // ---- I_PCM: lossless block, chroma gray ----
        bw.ue(25)
        bw.alignZero() // pcm_alignment_zero_bit(s)
        var i = 0
        while (i < 256) {
          val v = src((py + i / 16) * w + px + (i % 16)) & 0xff
          bw.u(v, 8)
          pic.plane((py + i / 16) * w + px + (i % 16)) = v.toByte
          i += 1
        }
        i = 0
        while (i < 128) { bw.u(128, 8); i += 1 }
        var b = 0
        while (b < 16) {
          val (ox, oy) = blkPos(b)
          val gi = (by0 + oy / 4) * pic.bw + (bx0 + ox / 4)
          pic.lumaTc(gi) = 16
          pic.decoded(gi) = true
          b += 1
        }
        markChromaTc(pic, mbX, mbY, 16, 16)
        pic.mbQp(mbAddr) = 0
        pic.mbSlice(mbAddr) = slice
      } else if (isI4) {
        // ---- Intra_4x4: availability-filtered mode rotation ----
        val modes = new Array[Int](16)
        val coeffBlocks = new Array[Array[Int]](16) // raster-order quantized
        val reconBlocks = new Array[Array[Int]](16)
        // first pass: choose modes + produce residuals with closed-loop
        // recon (prediction needs reconstructed earlier blocks, so
        // recon happens inline)
        var b = 0
        while (b < 16) {
          val (ox, oy) = blkPos(b)
          val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
          val r = ref4(pic, px + ox, py + oy, slice)
          val candidates = Array(2, 0, 1, 3, 7, 4, 5, 6, 8).filter {
            case 0 => r.availTop
            case 1 => r.availLeft
            case 2 => true
            case 3 | 7 => r.availTop
            case 4 | 5 | 6 => r.availTop && r.availLeft && r.availCorner
            case 8 => r.availLeft
          }
          val mode = candidates((mbAddr + b) % candidates.length)
          modes(b) = mode
          pic.i4Mode(gby * pic.bw + gbx) = mode
          val pred = H264Pred.pred4x4(mode, r)
          val srcB = srcBlock(ox, oy, 4)
          val diff = Array.tabulate(16)(i => srcB(i) - pred(i))
          val q = H264Transform.quant4x4(H264Transform.forward4x4(diff), qp,
            skipDc = false)
          coeffBlocks(b) = q
          val res = H264Transform.inverse4x4(
            H264Transform.dequant4x4(q, qp, dcBypass = false))
          val recon = Array.tabulate(16)(i =>
            H264Transform.clip255(pred(i) + res(i)))
          reconBlocks(b) = recon
          writePlane(ox, oy, recon, 4)
          pic.decoded(gby * pic.bw + gbx) = true
          // lumaTc is provisional until cbp zeroes a quadrant below
          b += 1
        }
        // cbp from quantized coefficients, then zero uncoded quadrants
        var cbpLuma = 0
        var q8 = 0
        while (q8 < 4) {
          val any = (0 until 4).exists(j =>
            coeffBlocks(q8 * 4 + j).exists(_ != 0))
          if (any) cbpLuma |= 1 << q8
          q8 += 1
        }
        // blocks in an uncoded quadrant reconstruct as pure prediction;
        // redo those blocks (and any that USED a redone neighbor —
        // avoided by zeroing in block order and recomputing recon
        // sequentially, which the closed loop below does)
        // NOTE (r18 review): a quadrant whose cbpLuma bit is 0 has, by
        // the OR-of-nonzero construction above, only all-zero
        // coefficient blocks — which already reconstruct as pure
        // prediction in the first pass (zero residual). No re-run is
        // ever needed; the invariant is asserted.
        assert((0 until 16).forall(b2 =>
          (cbpLuma & (1 << (b2 / 4))) != 0 || coeffBlocks(b2).forall(_ == 0)))
        // chroma residue plan (parse-path exercise)
        val cbpChroma = chromaPlan(cfg, mbAddr)
        val cbp = cbpLuma | (cbpChroma << 4)
        // ---- write the MB ----
        bw.ue(0) // mb_type I_NxN
        b = 0
        while (b < 16) {
          val (ox, oy) = blkPos(b)
          val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
          def nbMode(x: Int, y: Int): Int =
            if (x < 0 || y < 0 || x >= pic.bw || y >= pic.bh) 2
            else if (x / 4 == mbX && y / 4 == mbY) {
              val m = pic.i4Mode(y * pic.bw + x); if (m < 0) 2 else m
            } else if (!H264Decoder.blkAvail(pic, x, y, slice)) 2
            else { val m = pic.i4Mode(y * pic.bw + x); if (m < 0) 2 else m }
          val predMode = math.min(nbMode(gbx - 1, gby), nbMode(gbx, gby - 1))
          if (modes(b) == predMode) bw.flag(true)
          else {
            bw.flag(false)
            bw.u(if (modes(b) < predMode) modes(b) else modes(b) - 1, 3)
          }
          b += 1
        }
        bw.ue(0) // intra_chroma_pred_mode: DC
        bw.ue(H264Tables.cbpIntraInv(cbp))
        if (cbp != 0) bw.se(0) // mb_qp_delta
        // residuals in block order (writing needs the PRE-write nC
        // grid state, so totalCoeff marks trail each block)
        val tcArr = new Array[Int](16)
        b = 0
        while (b < 16) {
          val (ox, oy) = blkPos(b)
          val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
          if ((cbpLuma & (1 << (b / 4))) != 0) {
            val nC = lumaNc(pic, gbx, gby, slice)
            val scan = rasterToScan(coeffBlocks(b), acOnly = false)
            tcArr(b) = H264Cavlc.encodeBlock(bw, scan, nC, 16)
          } else tcArr(b) = 0
          pic.lumaTc(gby * pic.bw + gbx) = tcArr(b)
          b += 1
        }
        encodeChroma(bw, pic, mbX, mbY, cbpChroma, slice, mbAddr)
        pic.mbQp(mbAddr) = qp
        pic.mbSlice(mbAddr) = slice
      } else {
        // ---- Intra_16x16 ----
        val r = ref16(pic, mbX, mbY, slice)
        val candidates = Array(2, 0, 1, 3).filter {
          case 0 => r.availTop
          case 1 => r.availLeft
          case 2 => true
          case 3 => r.availTop && r.availLeft && r.availCorner
        }
        val mode = candidates(mbAddr % candidates.length)
        val pred = H264Pred.pred16x16(mode, r)
        // forward: per-4x4 transform of the residual; DC coefficients
        // split into the Hadamard path
        val srcMb = srcBlock(0, 0, 16)
        val acCoeffs = new Array[Array[Int]](16) // raster order, [0] unused
        val dcRaw = new Array[Int](16) // raster over blocks
        var blkY = 0
        while (blkY < 4) {
          var blkX = 0
          while (blkX < 4) {
            val diff = Array.tabulate(16) { i =>
              val x = blkX * 4 + i % 4; val y = blkY * 4 + i / 4
              srcMb(y * 16 + x) - pred(y * 16 + x)
            }
            val wT = H264Transform.forward4x4(diff)
            dcRaw(blkY * 4 + blkX) = wT(0)
            acCoeffs(blkY * 4 + blkX) =
              H264Transform.quant4x4(wT, qp, skipDc = true)
            blkX += 1
          }
          blkY += 1
        }
        val dcQ = H264Transform.quantLumaDc(dcRaw, qp)
        val cbpLuma = if (acCoeffs.exists(_.exists(_ != 0))) 15 else 0
        val cbpChroma = chromaPlan(cfg, mbAddr)
        val mbType = 1 + mode + 4 * cbpChroma + 12 * (if (cbpLuma != 0) 1 else 0)
        bw.ue(mbType)
        bw.ue(0) // intra_chroma_pred_mode: DC
        bw.se(0) // mb_qp_delta (always for I_16x16)
        // DC block: zig-zag scan of the raster DC grid
        val dcNc = lumaNc(pic, bx0, by0, slice)
        val dcScan = rasterToScan(dcQ, acOnly = false)
        H264Cavlc.encodeBlock(bw, dcScan, dcNc, 16)
        // decoder-side DC reconstruction
        val dcRecon = H264Transform.lumaDc(dcQ, qp)
        // AC blocks + recon, in block order
        var b = 0
        while (b < 16) {
          val (ox, oy) = blkPos(b)
          val gbx = bx0 + ox / 4; val gby = by0 + oy / 4
          val rasterIdx = (oy / 4) * 4 + (ox / 4)
          var tcHere = 0
          if (cbpLuma != 0) {
            val nC = lumaNc(pic, gbx, gby, slice)
            val scan = rasterToScan(acCoeffs(rasterIdx), acOnly = true)
            tcHere = H264Cavlc.encodeBlock(bw, scan, nC, 15)
          }
          val ras =
            if (cbpLuma != 0) acCoeffs(rasterIdx).clone() else new Array[Int](16)
          ras(0) = dcRecon(rasterIdx)
          val res = H264Transform.inverse4x4(
            H264Transform.dequant4x4(ras, qp, dcBypass = true))
          val recon = Array.tabulate(16) { i =>
            val pi = (oy + i / 4) * 16 + ox + (i % 4)
            H264Transform.clip255(pred(pi) + res(i))
          }
          writePlane(ox, oy, recon, 4)
          val gi = gby * pic.bw + gbx
          pic.lumaTc(gi) = tcHere
          pic.decoded(gi) = true
          b += 1
        }
        encodeChroma(bw, pic, mbX, mbY, cbpChroma, slice, mbAddr)
        pic.mbQp(mbAddr) = qp
        pic.mbSlice(mbAddr) = slice
      }
      mbAddr += 1
    }
    bw.trailing()
    } // encodeSlice

    val rowsPer = if (cfg.mbRowsPerSlice <= 0) mbH else cfg.mbRowsPerSlice
    val sliceNals = (0 until mbH by rowsPer).zipWithIndex.map {
      case (row0, slice) =>
        val bw = new BitWriter
        encodeSlice(bw, slice, row0 * mbW,
          math.min(total, (row0 + rowsPer) * mbW))
        nalBytes(0x65, bw.toBytes)
    }
    val sample = lenPrefixed(Seq(
      nalBytes(0x67, spsRbsp(mbW, mbH, cfg.pocType)),
      nalBytes(0x68, ppsRbsp(qp, cfg.redundantPicCnt))) ++ sliceNals)
    // in-loop filter on the closed-loop recon (mirrors decode order +
    // the slice-boundary rule when idc == 2)
    if (cfg.deblock)
      H264Deblock.filterPlane(pic.plane, w, h,
        (x, y) => pic.mbQp(y * mbW + x), (x, y) => pic.mbSlice(y * mbW + x),
        idc, 0, 0)
    (sample, pic.plane)
  }

  /** `avcC` decoder-configuration payload (ISO 14496-15) for this
    * encoder's SPS/PPS — the out-of-band convention `avc1` sample
    * entries use. `lengthSize` is the per-sample NAL length-field
    * width (1, 2 or 4).
    */
  def avccPayload(widthMbs: Int, heightMbs: Int, qp: Int,
      lengthSize: Int): Array[Byte] = {
    require(Set(1, 2, 4)(lengthSize))
    val sps = nalBytes(0x67, spsRbsp(widthMbs, heightMbs))
    val pps = nalBytes(0x68, ppsRbsp(qp))
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // configurationVersion
    out.write(66); out.write(0xc0); out.write(20) // profile/compat/level
    out.write(0xfc | (lengthSize - 1))
    out.write(0xe0 | 1) // one SPS
    out.write(sps.length >> 8); out.write(sps.length & 0xff)
    out.write(sps, 0, sps.length)
    out.write(1) // one PPS
    out.write(pps.length >> 8); out.write(pps.length & 0xff)
    out.write(pps, 0, pps.length)
    out.toByteArray
  }

  /** rewrite an [[encodeFrame]] access unit (4-byte-framed SPS+PPS+IDR)
    * into the avc1 sample shape: parameter sets dropped (they live in
    * the avcC) and the remaining NALs re-framed at `lengthSize`
    */
  def toAvc1Sample(accessUnit: Array[Byte], lengthSize: Int): Array[Byte] = {
    val slices = H264Decoder.splitNals(accessUnit)
      .filter(n => (n(0) & 0x1f) != 7 && (n(0) & 0x1f) != 8)
    val out = new java.io.ByteArrayOutputStream()
    slices.foreach { n =>
      var k = lengthSize - 1
      while (k >= 0) { out.write((n.length >> (8 * k)) & 0xff); k -= 1 }
      out.write(n, 0, n.length)
    }
    out.toByteArray
  }

  /** chroma CBP rotation: none / DC-only / DC+AC */
  private def chromaPlan(cfg: Cfg, mbAddr: Int): Int =
    if (!cfg.chromaResidue) 0
    else mbAddr % 5 match {
      case 1 => 1
      case 3 => 2
      case _ => 0
    }

  /** write the chroma residual section and mirror the decoder's nC
    * bookkeeping; coefficient VALUES are a deterministic small pattern
    * (chroma recon is outside the luma contract — these only exercise
    * the parse path and keep the stream conforming)
    */
  private def encodeChroma(bw: BitWriter, pic: Pic, mbX: Int, mbY: Int,
      cbpChroma: Int, slice: Int, mbAddr: Int): Unit = {
    if ((cbpChroma & 3) != 0) {
      var comp = 0
      while (comp < 2) {
        val dc = Array(((mbAddr + comp) % 3) - 1, 0, (mbAddr % 2), 0)
        H264Cavlc.encodeBlock(bw, dc, -1, 4)
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
          val nC = chromaNc(pic, comp, cx, cy, slice)
          val ac = new Array[Int](15)
          ac((mbAddr + b) % 4) = if ((mbAddr + comp) % 2 == 0) 1 else -2
          tcOf(comp)(b) = H264Cavlc.encodeBlock(bw, ac, nC, 15)
          b += 1
        }
        comp += 1
      }
    }
    markChromaTcPer(pic, mbX, mbY, tcOf)
  }

  private def markChromaTc(pic: Pic, mbX: Int, mbY: Int, tcU: Int,
      tcV: Int): Unit = {
    var comp = 0
    while (comp < 2) {
      var b = 0
      while (b < 4) {
        val gi = (mbY * 2 + b / 2) * pic.cbw + (mbX * 2 + b % 2)
        pic.chromaTc(comp)(gi) = if (comp == 0) tcU else tcV
        pic.chromaDec(comp)(gi) = true
        b += 1
      }
      comp += 1
    }
  }

  private def markChromaTcPer(pic: Pic, mbX: Int, mbY: Int,
      tcOf: Array[Array[Int]]): Unit = {
    var comp = 0
    while (comp < 2) {
      var b = 0
      while (b < 4) {
        val gi = (mbY * 2 + b / 2) * pic.cbw + (mbX * 2 + b % 2)
        pic.chromaTc(comp)(gi) = tcOf(comp)(b)
        pic.chromaDec(comp)(gi) = true
        b += 1
      }
      comp += 1
    }
  }

  /** raster → scan order (inverse of the decoder's scanToRaster) */
  private def rasterToScan(raster: Array[Int], acOnly: Boolean): Array[Int] = {
    val n = if (acOnly) 15 else 16
    val off = if (acOnly) 1 else 0
    Array.tabulate(n)(k => raster(H264Tables.zigZag4x4(k + off)))
  }
}
