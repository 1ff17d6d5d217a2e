package graft.llm

import java.awt.image.BufferedImage

/** 64-bit DCT perceptual hash for image near-dedup (the LAION/Dolma-style
  * "same picture, different encode/size/exposure" case that exact
  * content-md5 dedup misses; reference has no media dedup at all — this
  * extends the multimodal pillar into the dedup family).
  *
  * Classic pHash construction (Zauner 2010; the ImageHash/pHash.org
  * algorithm): decode → 32×32 luma grid (the same pure integer
  * source-index resample as [[ImageCodec.resizeNearest]]) → 2-D DCT-II →
  * top-left 8×8 coefficient block → threshold each coefficient against
  * the block median → 64 bits, row-major, MSB first.
  *
  * Determinism contract (the [[Multimodal]] fixture discipline): the
  * fixture's expected `phash64` column is computed by THIS code at
  * authoring time from the encoded bytes, and the engine re-derives it
  * from the same bytes with the same code — `StrictMath.cos` for the
  * basis table and a fixed summation order make the doubles reproducible
  * across JVMs.
  *
  * Invariances that make it a NEAR-dup key (all exercised by the
  * fixture's variant rows + PHashSpec):
  *  - re-encode (PNG↔JPEG): smooth content survives the lossy round trip
  *    in the low-frequency block → small hamming distance;
  *  - uniform brightness shift: only the DC coefficient moves, every AC
  *    coefficient is unchanged → hash unchanged (DC sits above the
  *    median either way);
  *  - integer upscale: the 32×32 grid indexes `gx·(s·w)/32` then maps
  *    back `/s` — exactly the source pixels of the original's grid →
  *    hash identical.
  */
object PHash {

  /** luma grid side */
  private val N = 32
  /** low-frequency block side (K² = 64 hash bits) */
  private val K = 8

  /** DCT-II basis rows for the K kept frequencies over N samples;
    * StrictMath so the table is bit-identical on every JVM
    */
  private lazy val cosT: Array[Array[Double]] =
    Array.tabulate(K, N)((u, x) =>
      StrictMath.cos(((2 * x + 1) * u).toDouble * StrictMath.PI / (2.0 * N)))

  /** pHash of decoded pixels. Luma is the integer BT.601 channel sum
    * (299·r + 587·g + 114·b, no division — the DCT threshold is
    * scale-invariant so the /1000 would only lose information).
    */
  def ofImage(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    // 32×32 luma grid via the resizeNearest integer source-index math
    val luma = Array.ofDim[Double](N, N)
    var gy = 0
    while (gy < N) {
      val sy = (gy.toLong * h / N).toInt
      var gx = 0
      while (gx < N) {
        val sx = (gx.toLong * w / N).toInt
        val rgb = img.getRGB(sx, sy)
        luma(gy)(gx) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)).toDouble
        gx += 1
      }
      gy += 1
    }
    hashGrid(luma)
  }

  /** the DCT+median core over ANY 32×32 non-negative feature grid —
    * shared by the image path (luma) and [[AudioFp]] (time×frequency
    * spectrogram). Invariant under a global positive scaling of the grid
    * (the DCT is linear and the median threshold scales with it), which
    * is what makes the audio hash amplitude-invariant for free.
    */
  def hashGrid(grid: Array[Array[Double]]): Long = {
    require(grid.length == N && grid.forall(_.length == N),
      s"hashGrid expects a ${N}x$N grid")
    val luma = grid
    // separable 2-D DCT-II, rows first: tmp(v)(y) = Σx luma(y)(x)·cos(v,x)
    val tmp = Array.ofDim[Double](K, N)
    var v = 0
    while (v < K) {
      var y = 0
      while (y < N) {
        var s = 0.0
        var x = 0
        while (x < N) { s += luma(y)(x) * cosT(v)(x); x += 1 }
        tmp(v)(y) = s
        y += 1
      }
      v += 1
    }
    // then columns: f(u)(v) = Σy tmp(v)(y)·cos(u,y)
    val f = new Array[Double](K * K)
    var u = 0
    while (u < K) {
      var vv = 0
      while (vv < K) {
        var s = 0.0
        var y = 0
        while (y < N) { s += tmp(vv)(y) * cosT(u)(y); y += 1 }
        f(u * K + vv) = s
        vv += 1
      }
      u += 1
    }
    // median threshold: upper median of the 64 coefficients (a concrete
    // array element — no averaging, so ties resolve deterministically)
    val sorted = f.clone()
    java.util.Arrays.sort(sorted)
    val median = sorted(K * K / 2)
    var bits = 0L
    var i = 0
    while (i < K * K) {
      if (f(i) > median) bits |= 1L << (K * K - 1 - i)
      i += 1
    }
    bits
  }

  /** pHash of an encoded PNG/JPEG payload; None for other containers or
    * undecodable bytes
    */
  def ofBytes(bytes: Array[Byte]): Option[Long] =
    ImageCodec.decodeImage(bytes).map(ofImage)

  /** pHash of a raw luma plane (the [[Mp4Meta]] decoded-frame format):
    * same 32×32 integer source-index resample, bytes already ARE luma
    */
  def ofLuma(fr: Array[Byte], w: Int, h: Int): Long = {
    val grid = Array.ofDim[Double](N, N)
    var gy = 0
    while (gy < N) {
      val sy = (gy.toLong * h / N).toInt
      var gx = 0
      while (gx < N) {
        val sx = (gx.toLong * w / N).toInt
        grid(gy)(gx) = (fr(sy * w + sx) & 0xff).toDouble
        gx += 1
      }
      gy += 1
    }
    hashGrid(grid)
  }

  /** hamming distance between two hashes */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
