package graft.llm.h264

/** Luma in-loop deblocking for all-intra pictures (public spec §8.7):
  * per-MB, raster order — vertical edges left→right, then horizontal
  * edges top→bottom, each reading already-filtered samples (the
  * spec's sequential dependence). All-intra collapses the boundary
  * strength derivation: MB edges are bS 4 (strong filter), internal
  * transform edges bS 3 (normal filter with tC0) — the only two rows
  * of Table 8-17 this path needs.
  *
  * Chroma is not filtered: the decode contract ([[graft.llm.FrameDecoder]])
  * outputs the luma plane only, and chroma filtering feeds nothing
  * downstream.
  */
object H264Deblock {
  import H264Tables.{alphaTab, betaTab, tc0Bs3}

  @inline private def clip(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** filter one 8-sample line across an edge: idx 0..3 = p3..p0,
    * 4..7 = q0..q3 in `s`; writes filtered values back
    */
  private def filterLine(s: Array[Int], bs4: Boolean, alpha: Int,
      beta: Int, tc0: Int): Unit = {
    val p3 = s(0); val p2 = s(1); val p1 = s(2); val p0 = s(3)
    val q0 = s(4); val q1 = s(5); val q2 = s(6); val q3 = s(7)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return
    if (bs4) {
      val strongP = math.abs(p2 - p0) < beta &&
        math.abs(p0 - q0) < (alpha >> 2) + 2
      val strongQ = math.abs(q2 - q0) < beta &&
        math.abs(p0 - q0) < (alpha >> 2) + 2
      if (strongP) {
        s(3) = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        s(2) = (p2 + p1 + p0 + q0 + 2) >> 2
        s(1) = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
      } else s(3) = (2 * p1 + p0 + q1 + 2) >> 2
      if (strongQ) {
        s(4) = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        s(5) = (q2 + q1 + q0 + p0 + 2) >> 2
        s(6) = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
      } else s(4) = (2 * q1 + q0 + p1 + 2) >> 2
    } else {
      val ap = math.abs(p2 - p0) < beta
      val aq = math.abs(q2 - q0) < beta
      val tc = tc0 + (if (ap) 1 else 0) + (if (aq) 1 else 0)
      val delta = clip(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      s(3) = H264Transform.clip255(p0 + delta)
      s(4) = H264Transform.clip255(q0 - delta)
      if (ap) s(2) = p1 + clip(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
      if (aq) s(5) = q1 + clip(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    }
  }

  /** run the filter over the full luma plane. `qpOf(mbX, mbY)` is each
    * MB's QPy (0 for I_PCM per §8.7.2); `sliceOf` the MB's slice id;
    * `idc` the slice's disable_deblocking_filter_idc with offsets
    * applying to all its MBs (single-parameter approximation: the
    * fixture encoder emits one slice per picture; multi-slice streams
    * with per-slice offsets are rejected upstream)
    */
  def filterPlane(plane: Array[Byte], w: Int, h: Int,
      qpOf: (Int, Int) => Int, sliceOf: (Int, Int) => Int,
      idc: Int, offA: Int, offB: Int): Unit = {
    if (idc == 1) return
    val mbW = w / 16; val mbH = h / 16
    val line = new Array[Int](8)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val qpQ = qpOf(mbX, mbY)
        val slQ = sliceOf(mbX, mbY)
        // vertical edges (filter across columns), left edge first
        var e = 0
        while (e < 4) {
          val x0 = mbX * 16 + e * 4
          val isMbEdge = e == 0
          val doEdge =
            if (!isMbEdge) true
            else if (mbX == 0) false
            else if (idc == 2 && sliceOf(mbX - 1, mbY) != slQ) false
            else true
          if (doEdge) {
            val qpP = if (isMbEdge) qpOf(mbX - 1, mbY) else qpQ
            val qpAv = (qpP + qpQ + 1) >> 1
            val ia = clip(0, 51, qpAv + offA)
            val ib = clip(0, 51, qpAv + offB)
            val alpha = alphaTab(ia); val beta = betaTab(ib)
            if (alpha != 0 && beta != 0) {
              val tc0 = tc0Bs3(ia)
              var y = mbY * 16
              val yEnd = y + 16
              while (y < yEnd) {
                var k = 0
                while (k < 8) { line(k) = plane(y * w + x0 - 4 + k) & 0xff; k += 1 }
                filterLine(line, isMbEdge, alpha, beta, tc0)
                k = 1
                while (k < 7) { plane(y * w + x0 - 4 + k) = line(k).toByte; k += 1 }
                y += 1
              }
            }
          }
          e += 1
        }
        // horizontal edges (filter across rows), top edge first
        e = 0
        while (e < 4) {
          val y0 = mbY * 16 + e * 4
          val isMbEdge = e == 0
          val doEdge =
            if (!isMbEdge) true
            else if (mbY == 0) false
            else if (idc == 2 && sliceOf(mbX, mbY - 1) != slQ) false
            else true
          if (doEdge) {
            val qpP = if (isMbEdge) qpOf(mbX, mbY - 1) else qpQ
            val qpAv = (qpP + qpQ + 1) >> 1
            val ia = clip(0, 51, qpAv + offA)
            val ib = clip(0, 51, qpAv + offB)
            val alpha = alphaTab(ia); val beta = betaTab(ib)
            if (alpha != 0 && beta != 0) {
              val tc0 = tc0Bs3(ia)
              var x = mbX * 16
              val xEnd = x + 16
              while (x < xEnd) {
                var k = 0
                while (k < 8) { line(k) = plane((y0 - 4 + k) * w + x) & 0xff; k += 1 }
                filterLine(line, isMbEdge, alpha, beta, tc0)
                k = 1
                while (k < 7) { plane((y0 - 4 + k) * w + x) = line(k).toByte; k += 1 }
                x += 1
              }
            }
          }
          e += 1
        }
        mbX += 1
      }
      mbY += 1
    }
  }
}
