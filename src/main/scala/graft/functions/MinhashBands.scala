package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's MinHash LSH band keys from
  * its token array in ONE fused in-row pass — shingling, per-shingle
  * MD5, the Kirsch–Mitzenmacher hash-family mins, and the "|"-joined
  * band strings, with no shuffle and no interpreted lambda anywhere.
  *
  * Two formulations predate it:
  *   - the GROUPED path (Dedup.minhashSignature → bands): explode
  *     shingles, md5 + hex-parse each, groupBy(doc_id).agg(12 mins) —
  *     all codegen, but it SHUFFLES the exploded shingle table
  *     (~tokens × 16 B per doc) just to compute a per-doc pure
  *     function;
  *   - the IN-ROW path (Dedup.bandsInRow, built for streaming gates):
  *     shuffle-free but built from higher-order functions — per
  *     shingle one md5 lambda, one hex-parse lambda, and 12
  *     array_min·transform scans, all interpreted (the lang_best /
  *     hyperplane_buckets disease).
  * This expression is the best of both: the in-row shape at native
  * speed, so every LSH dedup consumer (batch AND stream) drops the
  * signature shuffle entirely — at 100 TB that halves the shuffle
  * count of the dedup family (shingle rows never materialize; the
  * only shuffle left is the (band, bucket) grouping itself).
  *
  * Bit-identical band keys to BOTH predecessors (spec-pinned):
  *   - shingles: positions 1..n−2 of the token array,
  *     `tok[i] ⊔ " " ⊔ tok[i+1] ⊔ " " ⊔ tok[i+2]` (concat_ws bytes,
  *     null tokens impossible from split but skipped like concat_ws
  *     skips nulls), DISTINCT — order irrelevant under min;
  *   - u1/u2: the md5 digest's first/second 4 bytes as unsigned —
  *     exactly `conv(substring(hex, 1|9, 8), 16, 10)` without the
  *     hex round-trip;
  *   - hᵢ = min over shingles of (u1 + i·u2) mod 4294967291, i = 1..12
  *     (u1 + 12·u2 < 13·2³² ≪ 2⁶³: no overflow, non-negative, so
  *     Java % == SQL %);
  *   - band key b (1-based) = "h₃ᵦ₋₂|h₃ᵦ₋₁|h₃ᵦ" in decimal.
  * Fewer than 3 tokens → EMPTY array (posexplode emits no row — the
  * grouped path's empty groupBy and bandsInRow's `filter(n >= 3)`).
  * Null token array → null (callers' split(text) is null only for null
  * text, which produced no row on both old paths — consumers explode,
  * and explode of null emits no row either).
  */
case class MinhashBands(child: Expression) extends UnaryExpression {

  import MinhashBands.{BandSize, MinhashMod, NumBands, NumHashes}

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    MinhashBands.compute(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mb = MinhashBands.getClass.getName.stripSuffix("$") // static forwarder (r15: janino cannot see MODULE$ on the companion CLASS - 26 silent interpreted fallbacks per Verify run)
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $mb.compute($a);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinhashBands = copy(child = newChild)
}

object MinhashBands {

  // the [[graft.llm.Dedup]] constants, mirrored here so the expression
  // has no init-order dependence on the Dedup object (values
  // spec-pinned equal)
  val NumHashes = 12
  val BandSize = 3
  val NumBands: Int = NumHashes / BandSize
  val MinhashMod = 4294967291L

  private val Space: Byte = ' '

  /** the whole per-row computation, shared verbatim by the interpreted
    * and codegen paths (one static call — the JIT inlines it; no
    * per-element dispatch anywhere).
    */
  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 3) return EmptyBands
    // token bytes once; a null marks the slot so the shingle join can
    // reproduce concat_ws semantics (null elements skipped WITH their
    // separator: concat_ws(" ", a, null, c) = "a c"; split() never
    // yields nulls, but the parity spec pins the behavior anyway)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    // per-shingle (u1, u2) with first-8-bytes-of-md5 semantics;
    // DISTINCT shingles only — dedup on the shingle bytes
    val seen = new java.util.HashSet[UTF8String]()
    val mins = new Array[Long](NumHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 1
    while (s <= n - 2) {
      // concat_ws(" ", t0, t1, t2): non-null parts joined by ' '
      var len = 0
      var parts = 0
      var p = s - 1
      while (p <= s + 1) {
        if (toks(p) != null) { len += toks(p).length; parts += 1 }
        p += 1
      }
      val sh = new Array[Byte](len + math.max(0, parts - 1))
      var at = 0
      var first = true
      p = s - 1
      while (p <= s + 1) {
        val t = toks(p)
        if (t != null) {
          if (!first) { sh(at) = Space; at += 1 }
          System.arraycopy(t, 0, sh, at, t.length)
          at += t.length
          first = false
        }
        p += 1
      }
      if (seen.add(UTF8String.fromBytes(sh))) {
        md.reset()
        val d = md.digest(sh)
        val u1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val u2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var h = 0
        while (h < NumHashes) {
          val v = (u1 + (h + 1).toLong * u2) % MinhashMod
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      s += 1
    }
    val out = new Array[Any](NumBands)
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < NumBands) {
      sb.setLength(0)
      sb.append(mins(b * BandSize))
      sb.append('|')
      sb.append(mins(b * BandSize + 1))
      sb.append('|')
      sb.append(mins(b * BandSize + 2))
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  private val EmptyBands = new GenericArrayData(Array.empty[Any])

  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_bands"),
    new ExpressionInfo(classOf[MinhashBands].getName, "minhash_bands"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "minhash_bands takes exactly 1 argument")
      MinhashBands(children.head)
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
