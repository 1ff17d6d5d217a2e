package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

/** Real WAV (RIFF/PCM) encode + decode in pure JVM code — the container
  * is a 44-byte little-endian header plus raw samples, so unlike
  * jpeg/mp4 no codec library is needed at all. Canonical form here:
  * 16-bit signed mono PCM.
  *
  * Decoded statistics are exact integer arithmetic (sample count,
  * duration from `n·1000 / rate` in longs, mean |sample| as an integer
  * sum with ONE double division at the end — the [[ImageCodec]]
  * brightness discipline), so fixture-authoring-time values equal
  * engine-decode-time values bit-for-bit.
  */
object WavCodec {

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length > 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E'

  /** canonical 44-byte-header 16-bit mono PCM encode */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** decoded stats of a PCM WAV payload */
  case class WavStats(sampleRate: Int, nSamples: Int, durationMs: Long,
      meanAbs: Double)

  /** parse RIFF chunks (fmt + data may sit after other chunks — walk the
    * chunk list, don't assume the canonical 44-byte layout); None for
    * non-WAV or non-16-bit-PCM payloads
    */
  def decode(bytes: Array[Byte]): Option[WavStats] = {
    if (!isWav(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var rate = 0
      var bits = 0
      var channels = 0
      var stats: Option[WavStats] = None
      while (bb.remaining() >= 8 && stats.isEmpty) {
        val id = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()),
          "US-ASCII")
        val len = bb.getInt()
        id match {
          case "fmt " =>
            val p = bb.position()
            val fmt = bb.getShort()
            channels = bb.getShort().toInt
            rate = bb.getInt()
            bb.getInt(); bb.getShort()
            bits = bb.getShort().toInt
            if (fmt != 1) return None
            bb.position(p + len + (len & 1))
          case "data" =>
            if (rate <= 0 || bits != 16 || channels != 1) return None
            val n = math.min(len, bb.remaining()) / 2
            var sum = 0L
            var i = 0
            while (i < n) { sum += math.abs(bb.getShort().toLong); i += 1 }
            stats = Some(WavStats(rate, n, n.toLong * 1000L / rate,
              if (n == 0) 0.0 else sum.toDouble / (32768.0 * n)))
          case _ =>
            bb.position(bb.position() + len + (len & 1))
        }
      }
      stats
    } catch { case _: Exception => None }
  }

  /** decoded PCM samples (for the spectral fingerprint path) — same
    * chunk walker as [[decode]]; None for non-WAV / non-16-bit-PCM
    */
  def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (!isWav(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var rate = 0
      var bits = 0
      var channels = 0
      var out: Option[(Int, Array[Short])] = None
      while (bb.remaining() >= 8 && out.isEmpty) {
        val id = new String(Array(bb.get(), bb.get(), bb.get(), bb.get()),
          "US-ASCII")
        val len = bb.getInt()
        id match {
          case "fmt " =>
            val p = bb.position()
            val fmt = bb.getShort()
            channels = bb.getShort().toInt
            rate = bb.getInt()
            bb.getInt(); bb.getShort()
            bits = bb.getShort().toInt
            if (fmt != 1) return None
            bb.position(p + len + (len & 1))
          case "data" =>
            if (rate <= 0 || bits != 16 || channels != 1) return None
            val n = math.min(len, bb.remaining()) / 2
            val ss = new Array[Short](n)
            var i = 0
            while (i < n) { ss(i) = bb.getShort(); i += 1 }
            out = Some((rate, ss))
          case _ =>
            bb.position(bb.position() + len + (len & 1))
        }
      }
      out
    } catch { case _: Exception => None }
  }

  /** deterministic fixture signal: per-(id, i) triangle-ish pattern */
  def testSamples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (((id * 131 + i.toLong * 37) % 65536) - 32768).toShort)

  /** time-based chirp mix: `(f0Hz, slopeHzPerSec, amplitude, phase)`
    * partials (phase integral 2π(f0·t + slope·t²/2)) rendered at any
    * sample rate — the SAME physical signal can be synthesized at 16 kHz
    * and 8 kHz, which is how the fixture builds its resample-invariance
    * variant for [[AudioFp]]. Chirps, not steady tones, for the same
    * reason [[ImageCodec.gradImage]] uses them: a sweeping ridge spreads
    * energy smoothly across the time×frequency grid, giving the hash's
    * median threshold real margin (steady tones concentrate the DCT in
    * one row and leave the tie boundary quantization-fragile — measured).
    */
  def toneSamples(partials: Seq[(Double, Double, Double, Double)],
      seconds: Double, rate: Int): Array[Short] =
    Array.tabulate((seconds * rate).toInt) { i =>
      val t = i.toDouble / rate
      val v = partials.foldLeft(0.0) { case (acc, (f0, sl, a, p)) =>
        acc + a * StrictMath.sin(
          2.0 * StrictMath.PI * (f0 * t + 0.5 * sl * t * t) + p)
      }
      math.max(-32768.0, math.min(32767.0, StrictMath.round(v).toDouble))
        .toInt.toShort
    }
}
