package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image decode for the multimodal path using the JDK's built-in
  * `javax.imageio` — no new dependency. PNG (r2 verdict task 5) and
  * baseline JPEG (r3 verdict task 5) both decode for real.
  *
  * Exactness across the two places a payload is decoded: PNG is lossless,
  * so pixel statistics equal those of the source image; JPEG is lossy, so
  * the fixture's expected columns are computed by decoding the ENCODED
  * bytes at authoring time — the engine later decodes the same bytes with
  * the same pure-Java ImageIO codec and reproduces them exactly. WAV/MP4
  * have no JDK codec and stay behind the documented stub seam
  * ([[Multimodal.decodeFeatures]]).
  */
object ImageCodec {

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G'

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  /** mean RGB luminance in [0,1]: integer channel sum first, ONE double
    * division at the end — no float-accumulation order to disagree about
    */
  def brightness(img: BufferedImage): Double = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum.toDouble / (3.0 * 255.0 * img.getWidth * img.getHeight)
  }

  /** decode a PNG or JPEG payload to its pixels; None for other
    * containers or undecodable payloads
    */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (!isPng(bytes) && !isJpeg(bytes)) None
    else try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    } catch { case _: Exception => None }

  /** decode a PNG or JPEG payload to (width, height, brightness); None
    * for other containers or undecodable payloads
    */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    decodeImage(bytes).map(img =>
      (img.getWidth, img.getHeight, brightness(img)))

  def encode(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** baseline JFIF encode at the JDK default quality — lossy, hence the
    * decode-the-encoded-bytes rule above for expected statistics
    */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** nearest-neighbor resample — source index by pure integer math
    * (`src = dst * srcDim / dstDim`), no Graphics2D interpolation state,
    * so the result is bit-deterministic across runs and JVMs
    */
  def resizeNearest(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    require(w > 0 && h > 0)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.getWidth / w).toInt
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** deterministic SMOOTH low-frequency fixture image for the
    * perceptual-hash rows ([[PHash]]'s domain assumption — the
    * modular-arithmetic [[testImage]] is white-noise-like, which is
    * exactly the content class a DCT hash is NOT meant to key): three
    * low-frequency sinusoidal plates whose orientation/phase vary with
    * `id`. Amplitude 110 around 128 keeps every channel in [18, 238], so
    * a small uniform brightness shift never clips — the shift then moves
    * ONLY the DC coefficient and the pHash is bit-identical (PHashSpec).
    */
  def gradImage(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val a = 1.0 + (id % 3).toDouble
    val b = 1.0 + ((id / 3) % 3).toDouble
    val phi = 0.7 * id.toDouble
    val tau = 2.0 * StrictMath.PI
    def ch(v: Double): Int = {
      val i = StrictMath.round(128.0 + 110.0 * v).toInt
      if (i < 0) 0 else if (i > 255) 255 else i
    }
    var y = 0
    while (y < h) {
      val fy = y.toDouble / (h - 1)
      var x = 0
      while (x < w) {
        val fx = x.toDouble / (w - 1)
        // chirps, not plain plates: the fx·fy / fx² cross terms spread
        // energy smoothly across many DCT bins, so the 8×8 block's
        // median threshold has real margin (a separable sinusoid leaves
        // ~49 of the 64 coefficients exactly zero and every tie bit
        // unstable — measured, not hypothetical)
        val r = ch(StrictMath.sin(tau * (a * fx + b * fy + 0.9 * fx * fy
          + 0.6 * fx * fx - 0.4 * fy * fy) + phi))
        val g = ch(StrictMath.sin(tau * (b * fx + a * fy - 0.7 * fx * fy
          + 0.5 * fy * fy) + 1.3 * phi))
        val bl = ch(StrictMath.cos(tau * (a * fx - b * fy + 0.8 * fx * fy
          - 0.3 * fx * fx) + 0.5 * phi))
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    img
  }

  /** an 8-bit luma plane as a gray RGB image (r = g = b = luma) — the
    * MJPEG encode path's bridge from raw-luma frames to the JDK JPEG
    * encoder; decoding back through the BT.601 integer luma recovers
    * the plane up to JPEG loss
    */
  def grayImage(luma: Array[Byte], w: Int, h: Int): BufferedImage = {
    require(luma.length == w * h, "luma plane must be w*h bytes")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = luma(y * w + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** uniform brightness shift with clamping (the near-dup fixture
    * variant; on [[gradImage]] output small shifts never clamp)
    */
  def brightnessShift(img: BufferedImage, delta: Int): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    def ch(v: Int): Int = {
      val i = v + delta
      if (i < 0) 0 else if (i > 255) 255 else i
    }
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        out.setRGB(x, y, (ch((rgb >> 16) & 0xff) << 16) |
          (ch((rgb >> 8) & 0xff) << 8) | ch(rgb & 0xff))
        x += 1
      }
      y += 1
    }
    out
  }

  /** deterministic fixture image: per-(id, x, y) channel pattern */
  def testImage(id: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 37 + x * 11 + y * 7) % 256).toInt
        val g = ((id * 59 + x * 5 + y * 13) % 256).toInt
        val b = ((id * 83 + x * 3 + y * 17) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}
