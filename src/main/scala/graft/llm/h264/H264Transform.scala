package graft.llm.h264

/** Integer transforms + scaling of the H.264 intra path (public spec
  * §8.5): the 4x4 core inverse transform (§8.5.12.2), the luma-DC
  * 4x4 Hadamard (§8.5.10), the chroma-DC 2x2 transform (§8.5.11), and
  * their scaling rules with flat scaling lists — plus the forward
  * twins the fixture encoder uses (§8.5 informative direction; only
  * bitstream validity depends on the forward side, reconstruction is
  * defined entirely by the inverse path).
  *
  * All blocks are length-16 (or 4 for chroma DC) Int arrays in RASTER
  * order; the CAVLC layer handles zig-zag.
  */
object H264Transform {
  import H264Tables.{levelScale, mf}

  /** §8.5.12.1 residual scaling for a 4x4 block (AC or full): d =
    * (c · LevelScale(qP%6, idx)) << (qP/6); index 0 is SKIPPED when
    * `dcBypass` (Intra_16x16 luma / chroma blocks receive their DC from
    * the separate DC transform)
    */
  def dequant4x4(coeffs: Array[Int], qP: Int, dcBypass: Boolean): Array[Int] = {
    val m = qP % 6; val shift = qP / 6
    val d = new Array[Int](16)
    var i = if (dcBypass) 1 else 0
    if (dcBypass) d(0) = coeffs(0) // already scaled by the DC pass
    while (i < 16) {
      d(i) = (coeffs(i) * levelScale(m, i)) << shift
      i += 1
    }
    d
  }

  /** §8.5.12.2 core inverse transform: horizontal then vertical
    * butterflies, final (x + 32) >> 6 rounding; returns the residual
    */
  def inverse4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var r = 0
    while (r < 4) { // horizontal
      val i = r * 4
      val d0 = d(i); val d1 = d(i + 1); val d2 = d(i + 2); val d3 = d(i + 3)
      val e0 = d0 + d2
      val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3
      val e3 = d1 + (d3 >> 1)
      e(i) = e0 + e3; e(i + 1) = e1 + e2; e(i + 2) = e1 - e2; e(i + 3) = e0 - e3
      r += 1
    }
    val out = new Array[Int](16)
    var c = 0
    while (c < 4) { // vertical
      val d0 = e(c); val d1 = e(4 + c); val d2 = e(8 + c); val d3 = e(12 + c)
      val e0 = d0 + d2
      val e1 = d0 - d2
      val e2 = (d1 >> 1) - d3
      val e3 = d1 + (d3 >> 1)
      out(c) = (e0 + e3 + 32) >> 6
      out(4 + c) = (e1 + e2 + 32) >> 6
      out(8 + c) = (e1 - e2 + 32) >> 6
      out(12 + c) = (e0 - e3 + 32) >> 6
      c += 1
    }
    out
  }

  /** §8.5.10 luma DC: 4x4 inverse Hadamard of the 16 DC coefficients,
    * then the DC-specific scaling — (f · LS(qP%6,0)) << (qP/6 − 6) for
    * qP ≥ 36, else rounded >> (6 − qP/6)
    */
  def lumaDc(coeffs: Array[Int], qP: Int): Array[Int] = {
    val f = hadamard4x4(coeffs)
    val ls = levelScale(qP % 6, 0)
    val out = new Array[Int](16)
    var i = 0
    if (qP >= 36) {
      val sh = qP / 6 - 6
      while (i < 16) { out(i) = (f(i) * ls) << sh; i += 1 }
    } else {
      val sh = 6 - qP / 6
      val rnd = 1 << (sh - 1)
      while (i < 16) { out(i) = (f(i) * ls + rnd) >> sh; i += 1 }
    }
    out
  }

  /** the 4x4 Hadamard (its own inverse up to scale; used by both DC
    * directions)
    */
  def hadamard4x4(c: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var r = 0
    while (r < 4) {
      val i = r * 4
      val a = c(i) + c(i + 2); val b = c(i) - c(i + 2)
      val g = c(i + 1) + c(i + 3); val h = c(i + 1) - c(i + 3)
      e(i) = a + g; e(i + 1) = b + h; e(i + 2) = b - h; e(i + 3) = a - g
      r += 1
    }
    val out = new Array[Int](16)
    var col = 0
    while (col < 4) {
      val a = e(col) + e(8 + col); val b = e(col) - e(8 + col)
      val g = e(4 + col) + e(12 + col); val h = e(4 + col) - e(12 + col)
      out(col) = a + g; out(4 + col) = b + h
      out(8 + col) = b - h; out(12 + col) = a - g
      col += 1
    }
    out
  }

  /** §8.5.11 chroma DC (4:2:0): 2x2 transform f = [[1,1],[1,-1]]·c·same,
    * then ((f · LS(qP%6,0)) << (qP/6)) >> 5
    */
  def chromaDc(c: Array[Int], qP: Int): Array[Int] = {
    val f = Array(
      c(0) + c(1) + c(2) + c(3),
      c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3),
      c(0) - c(1) - c(2) + c(3))
    val ls = levelScale(qP % 6, 0)
    val sh = qP / 6
    f.map(v => ((v * ls) << sh) >> 5)
  }

  // ---- forward direction (encoder only) -----------------------------

  /** forward core transform W = Cf · X · CfT with
    * Cf = [[1,1,1,1],[2,1,−1,−2],[1,−1,−1,1],[1,−2,2,−1]]
    */
  def forward4x4(x: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var r = 0
    while (r < 4) { // horizontal: rows of X · CfT
      val i = r * 4
      val s0 = x(i) + x(i + 3); val s1 = x(i + 1) + x(i + 2)
      val d0 = x(i) - x(i + 3); val d1 = x(i + 1) - x(i + 2)
      t(i) = s0 + s1; t(i + 1) = 2 * d0 + d1
      t(i + 2) = s0 - s1; t(i + 3) = d0 - 2 * d1
      r += 1
    }
    val out = new Array[Int](16)
    var c = 0
    while (c < 4) {
      val s0 = t(c) + t(12 + c); val s1 = t(4 + c) + t(8 + c)
      val d0 = t(c) - t(12 + c); val d1 = t(4 + c) - t(8 + c)
      out(c) = s0 + s1; out(4 + c) = 2 * d0 + d1
      out(8 + c) = s0 - s1; out(12 + c) = d0 - 2 * d1
      c += 1
    }
    out
  }

  /** forward quant (intra rounding f = 2^qbits/3): any output is a
    * LEGAL coefficient stream — recon is closed-loop through the
    * decoder-side dequant, so these constants affect distortion only
    */
  def quant4x4(w: Array[Int], qP: Int, skipDc: Boolean): Array[Int] = {
    val m = qP % 6
    val qbits = 15 + qP / 6
    val f = (1 << qbits) / 3
    val z = new Array[Int](16)
    var i = if (skipDc) 1 else 0
    while (i < 16) {
      val a = math.abs(w(i))
      val q = math.min(((a.toLong * mf(m, i) + f) >> qbits).toInt, 2000)
      z(i) = if (w(i) < 0) -q else q
      i += 1
    }
    z
  }

  /** forward luma-DC: Hadamard then quant. The scale is derived from
    * the DECODER'S §8.5.10 path for unity end-to-end gain: the decode
    * side computes Had(c)·LS·2^(qP/6)/64 and needs to land at 4·W_dc
    * (the same 4× the AC dequant applies before the >>6 inverse
    * transform), and Had∘Had = 16, so c = Had(W_dc)·MF/2^(13+qP/6).
    * Clamped to the prefix-15 CAVLC escape range — clamping changes
    * distortion only, recon stays closed-loop.
    */
  def quantLumaDc(dc: Array[Int], qP: Int): Array[Int] = {
    val w = hadamard4x4(dc)
    val m = qP % 6
    val qbits = 13 + qP / 6
    val f = (1 << qbits) / 3
    w.map { v =>
      val q0 = ((math.abs(v).toLong * mf(m, 0) + f) >> qbits).toInt
      val q = math.min(q0, 2000)
      if (v < 0) -q else q
    }
  }

  /** forward chroma-DC 2x2 + quant (same derivation against §8.5.11's
    * /32: c = Had2(W_dc)·MF/2^(12+qP/6))
    */
  def quantChromaDc(dc: Array[Int], qP: Int): Array[Int] = {
    val w = Array(
      dc(0) + dc(1) + dc(2) + dc(3),
      dc(0) - dc(1) + dc(2) - dc(3),
      dc(0) + dc(1) - dc(2) - dc(3),
      dc(0) - dc(1) - dc(2) + dc(3))
    val m = qP % 6
    val qbits = 12 + qP / 6
    val f = (1 << qbits) / 3
    w.map { v =>
      val q0 = ((math.abs(v).toLong * mf(m, 0) + f) >> qbits).toInt
      val q = math.min(q0, 2000)
      if (v < 0) -q else q
    }
  }

  @inline def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
}
