package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** [[PHash]] invariance + discrimination properties on the fixture's
  * image classes — these are the guarantees the x80/x81 near-dup
  * operators key on.
  */
class PHashSpec extends AnyFunSuite {

  private def grad(id: Long, w: Int = 64, h: Int = 48) =
    ImageCodec.gradImage(id, w, h)

  test("exact re-encode round trip: identical hash") {
    val img = grad(0)
    val h1 = PHash.ofBytes(ImageCodec.encode(img)).get
    val h2 = PHash.ofBytes(ImageCodec.encode(grad(0))).get
    assert(h1 === h2)
  }

  test("uniform brightness shift moves only DC: identical hash") {
    val img = grad(1)
    val h1 = PHash.ofImage(img)
    val h2 = PHash.ofImage(ImageCodec.brightnessShift(img, 6))
    assert(h1 === h2)
  }

  test("integer upscale hits the same 32x32 source pixels: identical hash") {
    val img = grad(2)
    val up = ImageCodec.resizeNearest(img, img.getWidth * 2,
      img.getHeight * 2)
    assert(PHash.ofImage(img) === PHash.ofImage(up))
  }

  test("JPEG re-encode of smooth content: small hamming distance") {
    (0L until 5L).foreach { id =>
      val img = grad(id)
      val png = PHash.ofBytes(ImageCodec.encode(img)).get
      val jpg = PHash.ofBytes(ImageCodec.encodeJpeg(img)).get
      val d = PHash.hamming(png, jpg)
      assert(d <= 7, s"id=$id hamming=$d")
    }
  }

  test("distinct gradient patterns: large hamming distance") {
    val hs = (0L until 5L).map(id => PHash.ofImage(grad(id)))
    for (i <- hs.indices; j <- hs.indices if i < j) {
      val d = PHash.hamming(hs(i), hs(j))
      assert(d > 7, s"pair ($i,$j) hamming=$d")
    }
  }

  test("non-image payloads hash to None") {
    assert(PHash.ofBytes(Array[Byte](1, 2, 3)).isEmpty)
    val wav = WavCodec.encode(WavCodec.testSamples(0, 256), 16000)
    assert(PHash.ofBytes(wav).isEmpty)
  }
}
