package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full k-position Bloom-filter probe of
  * [[graft.llm.Dedup.bloomPreGate]] in ONE compiled call per row —
  * `bloom_probe(fp, bitmap, m_bits, k_hashes)` is true iff every
  * Kirsch–Mitzenmacher position `(h1 + j·h2) mod mBits` (j = 1..k) is
  * set in the foldable `array<long>` bitmap, where h1/h2 are the first
  * two u32 words of the hex fingerprint the gate ALREADY computes.
  *
  * Why an expression and not composed builtins (the r11 verdict's x64
  * task): the composed gate paid 1+3 md5 digests per row (fp plus three
  * seeded position hashes) and then an explode → broadcast join →
  * per-doc count aggregate just to AND k bit-tests. Deriving h1/h2 from
  * the fp digest itself (Kirsch & Mitzenmacher 2006: two hashes
  * generate the whole family with no false-negative change) deletes the
  * three seeded digests, and the literal bitmap turns the join+agg into
  * a stateless projection. The remaining per-row cost is ONE md5
  * (upstream) + 16 hex-nibble parses + k mask tests — this expression
  * fuses those into compiled Java with zero per-row allocation (the
  * `conv`/`substring` composition allocates two UTF8Strings per row).
  *
  * Second child MUST be a foldable `array<long>` (the bitmap — the
  * artifact a deployment stores; mBits/8 bytes, KBs at realistic
  * per-shard sizing), third/fourth foldable ints (mBits, kHashes).
  * Null fp → null; a malformed fp (shorter than 16 hex chars — cannot
  * happen for md5 output) probes false.
  */
case class BloomProbe(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, ArrayType(LongType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable && fourth.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"bloom_probe requires (string, foldable array<long>, foldable " +
          s"int, foldable int), got ($a, $b, $c, $d)")
    }

  override def dataType: DataType = BooleanType

  @transient private lazy val words: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val mBits: Long =
    third.eval(null).asInstanceOf[Int].toLong
  @transient private lazy val kHashes: Int =
    fourth.eval(null).asInstanceOf[Int]

  override def nullSafeEval(fp: Any, b: Any, m: Any, k: Any): Any =
    java.lang.Boolean.valueOf(BloomProbe.probe(
      fp.asInstanceOf[UTF8String], words, mBits, kHashes))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (fp, _, _, _) => {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      s"""
        ${ev.value} =
          graft.functions.BloomProbe.probe($fp, $w, ${mBits}L, $kHashes);
      """
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): BloomProbe =
    copy(first = f, second = s, third = t, fourth = q)
}

object BloomProbe {

  /** the compiled probe body, shared by eval and codegen (generated Java
    * reaches it through the Scala static forwarder)
    */
  def probe(fp: UTF8String, words: Array[Long], mBits: Long,
      kHashes: Int): Boolean = {
    if (fp.numBytes() < 16) return false
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 8) {
      val c1 = fp.getByte(i)
      val c2 = fp.getByte(i + 8)
      h1 = (h1 << 4) | (if (c1 <= '9') c1 - '0' else c1 - 'a' + 10).toLong
      h2 = (h2 << 4) | (if (c2 <= '9') c2 - '0' else c2 - 'a' + 10).toLong
      i += 1
    }
    var j = 1
    while (j <= kHashes) {
      val p = (h1 + j.toLong * h2) % mBits
      if (((words((p >>> 6).toInt) >>> (p & 63L)) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_probe"),
    new ExpressionInfo(classOf[BloomProbe].getName, "bloom_probe"),
    (children: Seq[Expression]) => {
      require(children.size == 4, "bloom_probe takes exactly 4 arguments")
      BloomProbe(children(0), children(1), children(2), children(3))
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
