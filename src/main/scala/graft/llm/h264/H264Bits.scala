package graft.llm.h264

/** Bit-level I/O for the H.264 NAL/RBSP layer (ITU-T Rec. H.264 §7.2,
  * §9.1 — public spec; no reference-engine counterpart, the reference
  * delegates video to system codec libraries it never ships).
  *
  * Two small, allocation-free cursors over byte arrays:
  *   - [[BitReader]]: MSB-first reads, the three descriptor families the
  *     intra profile needs — u(n) fixed, ue(v)/se(v) Exp-Golomb — plus
  *     byte alignment for I_PCM and the rbsp_trailing_bits check.
  *   - [[BitWriter]]: the symmetric writer the fixture encoder uses.
  *
  * RBSP (un)escaping lives here too: inside a NAL, the sequence
  * 0x000001/0x000002/0x000003 is protected by an emulation-prevention
  * byte (§7.4.1.1) — 00 00 03 on the wire reads back as 00 00.
  */
final class BitReader(bytes: Array[Byte]) {
  private var pos = 0 // bit cursor

  def bitPos: Int = pos
  def bitsLeft: Int = bytes.length * 8 - pos

  /** u(n): n MSB-first bits as a non-negative Int (n ≤ 31) */
  def u(n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) {
      val byteI = pos >> 3
      if (byteI >= bytes.length) throw new H264BitstreamEnd
      v = (v << 1) | ((bytes(byteI) >> (7 - (pos & 7))) & 1)
      pos += 1
      i += 1
    }
    v
  }

  def flag(): Boolean = u(1) == 1

  /** ue(v): Exp-Golomb — leadingZeroBits zeros, a 1, then
    * leadingZeroBits info bits; codeNum = 2^lz − 1 + info (§9.1)
    */
  def ue(): Int = {
    var lz = 0
    while (u(1) == 0) {
      lz += 1
      if (lz > 31) throw new H264Malformed("ue(v) runaway")
    }
    if (lz == 0) 0 else (1 << lz) - 1 + u(lz)
  }

  /** se(v): signed Exp-Golomb — codeNum k maps to (−1)^(k+1)·⌈k/2⌉ */
  def se(): Int = {
    val k = ue()
    if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
  }

  def byteAligned: Boolean = (pos & 7) == 0

  def alignToByte(): Unit = while ((pos & 7) != 0) { u(1); () }

  /** one full byte, byte-aligned (I_PCM samples) */
  def alignedByte(): Int = { require(byteAligned); u(8) }

  /** more_rbsp_data() (§7.2): data remains iff the LAST 1-bit of the
    * RBSP (the rbsp_stop_one_bit) lies strictly beyond the cursor —
    * at the cursor means exactly the trailing bits remain, before it
    * means the stream is exhausted
    */
  def moreRbspData(): Boolean = {
    var last1 = -1
    var p = bytes.length * 8 - 1
    while (p >= pos && last1 < 0) {
      if (((bytes(p >> 3) >> (7 - (p & 7))) & 1) == 1) last1 = p
      p -= 1
    }
    last1 > pos
  }
}

/** decode ran off the end of the RBSP — always a malformed/truncated
  * stream, caught at the decodeLuma boundary (None, never a partial
  * frame)
  */
final class H264BitstreamEnd extends RuntimeException("RBSP exhausted")
final class H264Malformed(msg: String) extends RuntimeException(msg)

final class BitWriter {
  private val buf = new java.io.ByteArrayOutputStream()
  private var cur = 0
  private var nBits = 0

  def u(v: Int, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) {
      cur = (cur << 1) | ((v >> i) & 1)
      nBits += 1
      if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
      i -= 1
    }
  }

  def flag(b: Boolean): Unit = u(if (b) 1 else 0, 1)

  def ue(v: Int): Unit = {
    require(v >= 0)
    val codeNum = v + 1
    val len = 32 - Integer.numberOfLeadingZeros(codeNum)
    u(0, len - 1)
    u(codeNum, len)
  }

  def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)

  /** a raw code from the VLC tables: `bits` as a string of '0'/'1' */
  def code(bits: String): Unit = {
    var i = 0
    while (i < bits.length) { u(if (bits.charAt(i) == '1') 1 else 0, 1); i += 1 }
  }

  def byteAligned: Boolean = nBits == 0

  def alignZero(): Unit = while (nBits != 0) u(0, 1)

  /** rbsp_trailing_bits: stop bit + zero-pad to a byte edge (§7.3.2.11) */
  def trailing(): Unit = { u(1, 1); alignZero() }

  def toBytes: Array[Byte] = {
    require(nBits == 0, "unterminated RBSP")
    buf.toByteArray
  }
}

object Rbsp {
  /** strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1.1) */
  def unescape(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length - from)
    var zeros = 0
    var i = from
    while (i < nal.length) {
      val b = nal(i) & 0xff
      if (zeros >= 2 && b == 3) {
        zeros = 0 // drop the emulation byte
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** insert emulation-prevention bytes (encoder side) */
  def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xff
      if (zeros >= 2 && b <= 3) {
        out.write(3)
        zeros = 0
      }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }
}
