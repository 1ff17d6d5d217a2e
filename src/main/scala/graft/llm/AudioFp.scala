package graft.llm

/** 64-bit spectral fingerprint for audio near-dedup — the audio twin of
  * [[PHash]] (same hash core, same banded hamming search downstream):
  * the clip's duration splits into 32 equal frames, each frame's energy
  * at 32 fixed PHYSICAL frequencies (100·k Hz, k = 1..32, generalized
  * Goertzel recurrence — no FFT library, no per-sample trig) forms a
  * 32×32 time×frequency grid, then [[PHash.hashGrid]]'s DCT+median
  * threshold packs it into 64 bits.
  *
  * Why these coordinates make it a NEAR-dup key (fixture rows 17-20 +
  * AudioFpSpec):
  *  - amplitude scaling: every grid cell scales by the same factor and
  *    the median threshold scales with it → hash unchanged;
  *  - resampling: frames are duration-relative and the probe
  *    frequencies are fixed in Hz, so an 8 kHz rendering of the same
  *    signal lands on (approximately) the same grid up to a global
  *    sample-count factor → small hamming distance;
  *  - lossless WAV re-encode: trivially identical;
  *  - different content: different partials excite different bins →
  *    large hamming distance.
  *
  * Determinism: StrictMath throughout, fixed summation order — the
  * fixture's authored expected values reproduce bit-for-bit on any JVM
  * (the [[Multimodal]] x12 discipline).
  */
object AudioFp {

  private val Frames = 32
  private val Bins = 32
  private val BaseHz = 100.0

  /** fingerprint of decoded PCM samples; None if the clip is too short
    * to frame (< 32 samples) or the rate is unusable
    */
  def ofSamples(samples: Array[Short], rate: Int): Option[Long] = {
    val n = samples.length
    if (n < Frames || rate <= 0) return None
    val grid = Array.ofDim[Double](Frames, Bins)
    var f = 0
    while (f < Frames) {
      val lo = (f.toLong * n / Frames).toInt
      val hi = ((f + 1).toLong * n / Frames).toInt
      var k = 0
      while (k < Bins) {
        // generalized Goertzel at ω = 2π·f_k/rate over the frame; the
        // magnitude needs only the final two recurrence states
        val w = 2.0 * StrictMath.PI * BaseHz * (k + 1) / rate
        val coeff = 2.0 * StrictMath.cos(w)
        var s1 = 0.0
        var s2 = 0.0
        var i = lo
        while (i < hi) {
          val s0 = samples(i).toDouble + coeff * s1 - s2
          s2 = s1
          s1 = s0
          i += 1
        }
        val m2 = s1 * s1 + s2 * s2 - coeff * s1 * s2
        grid(f)(k) = StrictMath.sqrt(if (m2 > 0.0) m2 else 0.0)
        k += 1
      }
      f += 1
    }
    Some(PHash.hashGrid(grid))
  }

  /** fingerprint of an encoded WAV payload; None for other containers */
  def ofBytes(bytes: Array[Byte]): Option[Long] =
    WavCodec.decodeSamples(bytes).flatMap { case (rate, ss) =>
      ofSamples(ss, rate)
    }
}
