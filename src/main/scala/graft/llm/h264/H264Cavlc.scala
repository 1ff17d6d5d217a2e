package graft.llm.h264

/** CAVLC residual block coding (§9.2 of the public H.264 spec): the
  * context-adaptive VLC family used by the baseline/constrained
  * profiles. One object serves BOTH directions — the decoder and the
  * fixture encoder walk the same [[H264Tables]] objects, so a table
  * transcription slip cannot split the round-trip (see the provenance
  * note in H264Tables for what that does and does not prove).
  *
  * Blocks are coefficient arrays in SCAN order (zig-zag for 4x4, the
  * natural 2x2 order for chroma DC): index 0 = lowest frequency.
  */
object H264Cavlc {
  import H264Tables._

  /** prefix-code trie for one coeff_token class: (len, value) -> sym */
  final class Vlc(entries: Map[(Int, Int), String]) {
    val decodeMap: Map[(Int, Int), (Int, Int)] =
      entries.map { case ((t1, tc), bits) =>
        (bits.length, Integer.parseInt(bits, 2)) -> ((t1, tc))
      }
    val maxLen: Int = entries.valuesIterator.map(_.length).max
    def encode(t1: Int, tc: Int): String = entries((t1, tc))

    /** read one symbol: extend bit-by-bit until a code matches */
    def read(br: BitReader): (Int, Int) = {
      var v = 0
      var len = 0
      while (len <= maxLen) {
        v = (v << 1) | br.u(1)
        len += 1
        decodeMap.get((len, v)) match {
          case Some(sym) => return sym
          case None =>
        }
      }
      throw new H264Malformed(s"coeff_token: no code after $maxLen bits")
    }
  }

  val vlcNc0 = new Vlc(coeffTokenNc0)
  val vlcNc2 = new Vlc(coeffTokenNc2)
  val vlcNc4 = new Vlc(coeffTokenNc4)
  val vlcChromaDc = new Vlc(coeffTokenChromaDc)

  /** one total_zeros / run_before row compiled to a (len, value) →
    * symbol map at init (r18 review: the per-coefficient inner loop
    * was re-deriving maxLen and parsing code STRINGS per bit — the
    * CAVLC hot path the decode-throughput bench prices)
    */
  private final class RowVlc(codes: IndexedSeq[String]) {
    val maxLen: Int = codes.iterator.map(_.length).max
    private val map: Map[(Int, Int), Int] =
      codes.zipWithIndex.map { case (c, i) =>
        (c.length, Integer.parseInt(c, 2)) -> i
      }.toMap
    def read(br: BitReader): Int = {
      var v = 0
      var len = 0
      while (len <= maxLen) {
        v = (v << 1) | br.u(1)
        len += 1
        map.get((len, v)) match {
          case Some(sym) => return sym
          case None =>
        }
      }
      throw new H264Malformed("VLC: no code matched")
    }
  }

  private val totalZerosVlc: Map[Int, RowVlc] =
    totalZeros4x4.map { case (tc, codes) => tc -> new RowVlc(codes) }
  private val totalZerosChromaVlc: Map[Int, RowVlc] =
    totalZerosChromaDc.map { case (tc, codes) => tc -> new RowVlc(codes) }
  private val runBeforeVlc: Map[Int, RowVlc] =
    runBefore.map { case (zl, codes) => zl -> new RowVlc(codes) }

  /** decoded residual block: scan-order coefficients + the totalCoeff
    * the nC neighbor context needs
    */
  final case class Block(coeffs: Array[Int], totalCoeff: Int)

  /** §9.2 residual_block_cavlc. `nC`: the neighbor context (−1 for
    * chroma DC); `maxCoeffs`: 16 (full 4x4), 15 (AC-only) or 4
    * (chroma DC)
    */
  def decodeBlock(br: BitReader, nC: Int, maxCoeffs: Int): Block = {
    val (trailingOnes, totalCoeff) =
      if (nC == -1) vlcChromaDc.read(br)
      else if (nC < 2) vlcNc0.read(br)
      else if (nC < 4) vlcNc2.read(br)
      else if (nC < 8) vlcNc4.read(br)
      else {
        val v = br.u(6)
        if (v == 3) (0, 0)
        else ((v & 3), (v >> 2) + 1)
      }
    val coeffs = new Array[Int](maxCoeffs)
    if (totalCoeff == 0) return Block(coeffs, 0)
    if (totalCoeff > maxCoeffs)
      throw new H264Malformed(s"totalCoeff $totalCoeff > $maxCoeffs")

    // levels, highest frequency first
    val levels = new Array[Int](totalCoeff)
    var i = 0
    while (i < trailingOnes) {
      levels(i) = if (br.u(1) == 1) -1 else 1
      i += 1
    }
    var suffixLength =
      if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      var levelPrefix = 0
      while (br.u(1) == 0) {
        levelPrefix += 1
        if (levelPrefix > 31) throw new H264Malformed("level_prefix runaway")
      }
      val suffixSize =
        if (levelPrefix == 14 && suffixLength == 0) 4
        else if (levelPrefix >= 15) levelPrefix - 3
        else suffixLength
      var levelCode = (math.min(15, levelPrefix) << suffixLength) +
        (if (suffixSize > 0) br.u(suffixSize) else 0)
      if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == trailingOnes && trailingOnes < 3) levelCode += 2
      levels(i) =
        if ((levelCode & 1) == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }

    // total_zeros
    val totalZeros =
      if (totalCoeff == maxCoeffs) 0
      else if (maxCoeffs == 4) totalZerosChromaVlc(totalCoeff).read(br)
      else totalZerosVlc(totalCoeff).read(br)

    // run_before per coefficient, highest frequency first
    var zerosLeft = totalZeros
    var pos = totalCoeff + totalZeros - 1 // scan index of the top coeff
    i = 0
    while (i < totalCoeff) {
      val run =
        if (i == totalCoeff - 1) zerosLeft // last (lowest-freq) coeff
        else if (zerosLeft > 0) runBeforeVlc(math.min(zerosLeft, 7)).read(br)
        else 0
      if (pos < 0 || pos >= maxCoeffs)
        throw new H264Malformed("CAVLC run placement out of range")
      coeffs(pos) = levels(i)
      pos -= run + 1
      zerosLeft -= run
      i += 1
    }
    Block(coeffs, totalCoeff)
  }

  /** encoder twin of [[decodeBlock]]: writes `coeffs` (scan order) and
    * returns totalCoeff. Throws on levels too large for the prefix-15
    * escape — fixture QPs never get near it.
    */
  def encodeBlock(bw: BitWriter, coeffs: Array[Int], nC: Int,
      maxCoeffs: Int): Int = {
    require(coeffs.length == maxCoeffs)
    // gather nonzero coefficients, highest frequency first
    var totalCoeff = 0
    var highest = -1
    var idx = 0
    while (idx < maxCoeffs) {
      if (coeffs(idx) != 0) { totalCoeff += 1; highest = idx }
      idx += 1
    }
    val totalZeros =
      if (totalCoeff == 0) 0
      else (0 to highest).count(coeffs(_) == 0)
    // trailing ones: consecutive ±1 from the highest frequency, cap 3
    var trailingOnes = 0
    idx = highest
    var scanning = true
    while (scanning && idx >= 0 && trailingOnes < 3) {
      if (coeffs(idx) == 0) idx -= 1
      else if (math.abs(coeffs(idx)) == 1) { trailingOnes += 1; idx -= 1 }
      else scanning = false
    }

    // coeff_token
    if (nC == -1) bw.code(vlcChromaDc.encode(trailingOnes, totalCoeff))
    else if (nC < 2) bw.code(vlcNc0.encode(trailingOnes, totalCoeff))
    else if (nC < 4) bw.code(vlcNc2.encode(trailingOnes, totalCoeff))
    else if (nC < 8) bw.code(vlcNc4.encode(trailingOnes, totalCoeff))
    else bw.code(coeffTokenFlc(trailingOnes, totalCoeff))
    if (totalCoeff == 0) return 0

    // levels, highest first
    val lvls = (highest to 0 by -1).filter(coeffs(_) != 0).map(coeffs(_))
    var i = 0
    while (i < trailingOnes) {
      bw.u(if (lvls(i) < 0) 1 else 0, 1)
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      val level = lvls(i)
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == trailingOnes && trailingOnes < 3) {
        require(math.abs(level) >= 2, "non-trailing level must be |l|>=2")
        levelCode -= 2
      }
      if (suffixLength == 0) {
        if (levelCode < 14) { bw.u(0, levelCode); bw.u(1, 1) }
        else if (levelCode < 30) {
          bw.u(0, 14); bw.u(1, 1); bw.u(levelCode - 14, 4)
        } else {
          val esc = levelCode - 30
          require(esc < 4096, s"level $level beyond prefix-15 escape")
          bw.u(0, 15); bw.u(1, 1); bw.u(esc, 12)
        }
      } else {
        if (levelCode < (15 << suffixLength)) {
          bw.u(0, levelCode >> suffixLength); bw.u(1, 1)
          bw.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
        } else {
          val esc = levelCode - (15 << suffixLength)
          require(esc < 4096, s"level $level beyond prefix-15 escape")
          bw.u(0, 15); bw.u(1, 1); bw.u(esc, 12)
        }
      }
      // decoder-mirrored adaptation (must track the DECODED level,
      // which equals `level` by construction)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }

    // total_zeros
    if (totalCoeff != maxCoeffs) {
      val codes =
        if (maxCoeffs == 4) totalZerosChromaDc(totalCoeff)
        else totalZeros4x4(totalCoeff)
      bw.code(codes(totalZeros))
    }

    // run_before, highest first
    var zerosLeft = totalZeros
    val positions = (highest to 0 by -1).filter(coeffs(_) != 0)
    i = 0
    while (i < totalCoeff - 1) {
      val run = positions(i) - positions(i + 1) - 1
      if (zerosLeft > 0) bw.code(runBefore(math.min(zerosLeft, 7))(run))
      else require(run == 0)
      zerosLeft -= run
      i += 1
    }
    totalCoeff
  }

  /** decode-side escape check used by the spec for suffixLength==0
    * levelCode 30 boundary: the encoder above writes prefix 15 + 12-bit
    * suffix, which the decoder reads as suffixSize = 15−3 = 12 and
    * levelCode = 15<<0 + suffix + 15 = 30 + suffix — symmetric.
    */
}
