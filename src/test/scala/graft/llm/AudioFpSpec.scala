package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** [[AudioFp]] invariance + discrimination properties on the fixture's
  * tone-mix signal classes — the guarantees x82/x83 key on.
  */
class AudioFpSpec extends AnyFunSuite {

  private val tonesA = Seq((220.0, 400.0, 9000.0, 0.0),
    (900.0, -250.0, 6000.0, 1.0), (1500.0, 600.0, 4000.0, 2.0),
    (2600.0, -700.0, 2500.0, 0.5))
  private val tonesB = Seq((330.0, -120.0, 8000.0, 0.7),
    (700.0, 500.0, 5000.0, 1.9), (1900.0, -450.0, 3500.0, 0.2),
    (2900.0, 150.0, 2200.0, 2.4))

  private def fp(partials: Seq[(Double, Double, Double, Double)], rate: Int,
      scale: Double = 1.0): Long = {
    val scaled = partials.map { case (f, sl, a, p) => (f, sl, a * scale, p) }
    AudioFp.ofSamples(WavCodec.toneSamples(scaled, 2.0, rate), rate).get
  }

  test("WAV encode round trip: identical fingerprint") {
    val ss = WavCodec.toneSamples(tonesA, 2.0, 16000)
    val viaBytes = AudioFp.ofBytes(WavCodec.encode(ss, 16000)).get
    assert(viaBytes === AudioFp.ofSamples(ss, 16000).get)
  }

  test("amplitude scaling moves the whole grid uniformly: small hamming") {
    val d = PHash.hamming(fp(tonesA, 16000), fp(tonesA, 16000, 0.5))
    assert(d <= 2, s"hamming=$d")
  }

  test("resampling the same signal to 8 kHz: small hamming") {
    val d = PHash.hamming(fp(tonesA, 16000), fp(tonesA, 8000))
    assert(d <= 7, s"hamming=$d")
  }

  test("different tone mixes: large hamming") {
    val d = PHash.hamming(fp(tonesA, 16000), fp(tonesB, 16000))
    assert(d > 7, s"hamming=$d")
  }

  test("non-audio / too-short payloads fingerprint to None") {
    assert(AudioFp.ofBytes(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioFp.ofSamples(new Array[Short](16), 16000).isEmpty)
    val png = ImageCodec.encode(ImageCodec.gradImage(0, 16, 12))
    assert(AudioFp.ofBytes(png).isEmpty)
  }
}
