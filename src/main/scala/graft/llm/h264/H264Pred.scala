package graft.llm.h264

/** Intra prediction (public spec §8.3): the nine 4x4 modes
  * (§8.3.1.2.1–9) and the four 16x16 modes (§8.3.3), operating
  * directly on the UNFILTERED reconstruction plane (intra prediction
  * reads pre-deblock samples; the in-loop filter runs as a post-pass).
  *
  * Reference samples arrive as an explicit bundle so availability and
  * the top-right substitution rule (§8.3.1.2: unavailable p[x,−1],
  * x=4..7 replicate p[3,−1]) are decided by the caller, which owns the
  * decoded-block map.
  */
object H264Pred {

  /** reference bundle for one 4x4 block: top[0..7] (p[x,−1]),
    * left[0..3] (p[−1,y]), corner (p[−1,−1]); availability flags per
    * side — `top` must already contain substituted top-right samples
    * when availTop is true
    */
  final case class Ref4(top: Array[Int], left: Array[Int], corner: Int,
      availTop: Boolean, availLeft: Boolean, availCorner: Boolean)

  /** §8.3.1.2.1–9 — returns the 16 predicted samples (raster) or
    * throws [[H264Malformed]] when the mode needs an unavailable side
    * (an encoder-rule violation)
    */
  def pred4x4(mode: Int, r: Ref4): Array[Int] = {
    val out = new Array[Int](16)
    def needTop(): Unit =
      if (!r.availTop) throw new H264Malformed(s"4x4 mode $mode needs top")
    def needLeft(): Unit =
      if (!r.availLeft) throw new H264Malformed(s"4x4 mode $mode needs left")
    def needCorner(): Unit =
      if (!r.availCorner) throw new H264Malformed(s"4x4 mode $mode needs corner")
    val t = r.top; val l = r.left
    mode match {
      case 0 => // Vertical
        needTop()
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { out(y * 4 + x) = t(x); x += 1 }; y += 1 }
      case 1 => // Horizontal
        needLeft()
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { out(y * 4 + x) = l(y); x += 1 }; y += 1 }
      case 2 => // DC
        val v =
          if (r.availTop && r.availLeft)
            (t(0) + t(1) + t(2) + t(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (r.availTop) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else if (r.availLeft) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(out, v)
      case 3 => // Diagonal Down-Left
        needTop()
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
              else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 4 => // Diagonal Down-Right
        needTop(); needLeft(); needCorner()
        // §8.3.1.2.5 indexes p[x−y−2, −1] down to −1 (the corner)
        def tc4(i: Int): Int = if (i < 0) r.corner else t(i)
        def lc4(i: Int): Int = if (i < 0) r.corner else l(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (x > y)
                (tc4(x - y - 2) + 2 * tc4(x - y - 1) + tc4(x - y) + 2) >> 2
              else if (x < y)
                (lc4(y - x - 2) + 2 * lc4(y - x - 1) + lc4(y - x) + 2) >> 2
              else (t(0) + 2 * r.corner + l(0) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 5 => // Vertical-Right
        needTop(); needLeft(); needCorner()
        // top-extended axis: tc(−1) = corner
        def tc(i: Int): Int = if (i < 0) r.corner else t(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val zVR = 2 * x - y
            out(y * 4 + x) =
              if (zVR >= 0 && (zVR & 1) == 0)
                (tc(x - (y >> 1) - 1) + tc(x - (y >> 1)) + 1) >> 1
              else if (zVR >= 0)
                (tc(x - (y >> 1) - 2) + 2 * tc(x - (y >> 1) - 1) +
                  tc(x - (y >> 1)) + 2) >> 2
              else if (zVR == -1) (l(0) + 2 * r.corner + t(0) + 2) >> 2
              else {
                def lc(i: Int): Int = if (i < 0) r.corner else l(i)
                (lc(y - 1) + 2 * lc(y - 2) + lc(y - 3) + 2) >> 2
              }
            x += 1
          }
          y += 1
        }
      case 6 => // Horizontal-Down
        needTop(); needLeft(); needCorner()
        def lc(i: Int): Int = if (i < 0) r.corner else l(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val zHD = 2 * y - x
            out(y * 4 + x) =
              if (zHD >= 0 && (zHD & 1) == 0)
                (lc(y - (x >> 1) - 1) + lc(y - (x >> 1)) + 1) >> 1
              else if (zHD >= 0)
                (lc(y - (x >> 1) - 2) + 2 * lc(y - (x >> 1) - 1) +
                  lc(y - (x >> 1)) + 2) >> 2
              else if (zHD == -1) (l(0) + 2 * r.corner + t(0) + 2) >> 2
              else {
                def tcc(i: Int): Int = if (i < 0) r.corner else t(i)
                (tcc(x - 1) + 2 * tcc(x - 2) + tcc(x - 3) + 2) >> 2
              }
            x += 1
          }
          y += 1
        }
      case 7 => // Vertical-Left
        needTop()
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if ((y & 1) == 0)
                (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
              else
                (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) +
                  t(x + (y >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 8 => // Horizontal-Up
        needLeft()
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val zHU = x + 2 * y
            out(y * 4 + x) =
              if (zHU > 5) l(3) // saturated: only p[−1,3] remains
              else if (zHU == 5) (l(2) + 3 * l(3) + 2) >> 2
              else if ((zHU & 1) == 0)
                (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
              else
                (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                  l(y + (x >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case _ => throw new H264Malformed(s"intra4x4 mode $mode")
    }
    out
  }

  /** reference bundle for a 16x16 MB: top[0..15], left[0..15], corner */
  final case class Ref16(top: Array[Int], left: Array[Int], corner: Int,
      availTop: Boolean, availLeft: Boolean, availCorner: Boolean)

  /** §8.3.3 — the four Intra_16x16 modes (0 V, 1 H, 2 DC, 3 Plane) */
  def pred16x16(mode: Int, r: Ref16): Array[Int] = {
    val out = new Array[Int](256)
    mode match {
      case 0 =>
        if (!r.availTop) throw new H264Malformed("16x16 V needs top")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { out(y * 16 + x) = r.top(x); x += 1 }; y += 1 }
      case 1 =>
        if (!r.availLeft) throw new H264Malformed("16x16 H needs left")
        var y = 0
        while (y < 16) { var x = 0; while (x < 16) { out(y * 16 + x) = r.left(y); x += 1 }; y += 1 }
      case 2 =>
        val v =
          if (r.availTop && r.availLeft)
            (r.top.sum + r.left.sum + 16) >> 5
          else if (r.availTop) (r.top.sum + 8) >> 4
          else if (r.availLeft) (r.left.sum + 8) >> 4
          else 128
        java.util.Arrays.fill(out, v)
      case 3 =>
        if (!(r.availTop && r.availLeft && r.availCorner))
          throw new H264Malformed("16x16 Plane needs top+left+corner")
        def tc(i: Int): Int = if (i < 0) r.corner else r.top(i)
        def lc(i: Int): Int = if (i < 0) r.corner else r.left(i)
        var hAcc = 0; var vAcc = 0
        var i = 0
        while (i < 8) {
          hAcc += (i + 1) * (tc(8 + i) - tc(6 - i))
          vAcc += (i + 1) * (lc(8 + i) - lc(6 - i))
          i += 1
        }
        val a = 16 * (r.left(15) + r.top(15))
        val b = (5 * hAcc + 32) >> 6
        val c = (5 * vAcc + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            out(y * 16 + x) =
              H264Transform.clip255((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case _ => throw new H264Malformed(s"intra16x16 mode $mode")
    }
    out
  }
}
