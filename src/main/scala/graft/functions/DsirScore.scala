package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, ArrayType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's DSIR hashed-n-gram score
  * numerator in ONE fused pass — the (unigram ⊔ bigram) stream, the
  * md5 feature-bucket of each gram, the fitted-ratio lookup, and the
  * SORTED left-to-right sum, per row with no interpreted lambda.
  *
  * The previous formulation ([[graft.llm.TextOps.dsirScore]]) ran
  * `transform(gramArr, g => element_at(rLit, pmod(conv(substring(
  * md5(g), 1, 8), 16, 10), B)))` — one interpreted lambda PER GRAM
  * instantiating a MessageDigest and a hex round-trip (the lang_best /
  * hyperplane_buckets / minhash_bands disease on the DSIR family:
  * x43/x44 batch weights and the st10 streaming gate).
  *
  * Output: struct(n_grams LONG, s DOUBLE) — the caller keeps the
  * `s / n_grams` (or ln-weight) arithmetic in SQL, bit-identical:
  *   - grams: the tokens themselves (unigrams), then bigrams
  *     `tok[i] ⊔ " " ⊔ tok[i+1]` for n ≥ 2 (concat_ws semantics: a
  *     null neighbor is skipped with its separator);
  *   - bucket: the md5 digest's first 4 bytes as unsigned mod B —
  *     exactly `pmod(conv(substring(md5(g),1,8),16,10), B)`;
  *   - s: terms SORTED ASCENDING then summed left-to-right from 0.0
  *     (the `aggregate(sort_array(terms), 0.0, +)` fold — the sort
  *     makes the float sum order-deterministic across partitionings);
  *   - n_grams counts ALL grams including null unigrams (`size`
  *     counted them); a null TOKEN makes s null (its null unigram
  *     nulled the old fold through md5→conv→element_at→sum);
  *   - null token ARRAY → null struct (size(null) and the fold were
  *     both null).
  * The fitted ratio table rides as a literal vector in the expression
  * (the st10 batch-fit/stream-score discipline unchanged — the scores
  * constant-fold into the streaming plan).
  */
case class DsirScore(child: Expression, ratios: Vector[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"dsir_terms requires array<string>, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("s", DoubleType, nullable = true)))

  @transient private lazy val ratioArr: Array[Double] = ratios.toArray

  override def nullSafeEval(a: Any): Any =
    DsirScore.compute(a.asInstanceOf[ArrayData], ratioArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ds = DsirScore.getClass.getName.stripSuffix("$") // static forwarder (r15: janino cannot see MODULE$ on the companion CLASS - 26 silent interpreted fallbacks per Verify run)
      val r = ctx.addReferenceObj("ratios", ratioArr, "double[]")
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
          $ds.compute($a, $r);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): DsirScore = copy(child = newChild)
}

object DsirScore {

  private val Space: Byte = ' '

  /** the whole per-row computation, shared by interpreted and codegen
    * paths (one static call, no per-element dispatch).
    */
  def compute(arr: ArrayData, ratios: Array[Double]): InternalRow = {
    val n = arr.numElements()
    val b = ratios.length
    val toks = new Array[Array[Byte]](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) anyNull = true
      else toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val nGrams = n.toLong + (if (n >= 2) (n - 1).toLong else 0L)
    if (anyNull) return InternalRow(nGrams, null)
    val md = java.security.MessageDigest.getInstance("MD5")
    val nTerms = nGrams.toInt
    val terms = new Array[Double](nTerms)
    var t = 0
    def bucketOf(bytes: Array[Byte]): Int = {
      md.reset()
      val d = md.digest(bytes)
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (u % b).toInt
    }
    i = 0
    while (i < n) {
      terms(t) = ratios(bucketOf(toks(i))); t += 1
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val a0 = toks(i); val a1 = toks(i + 1)
      val g = new Array[Byte](a0.length + a1.length + 1)
      System.arraycopy(a0, 0, g, 0, a0.length)
      g(a0.length) = Space
      System.arraycopy(a1, 0, g, a0.length + 1, a1.length)
      terms(t) = ratios(bucketOf(g)); t += 1
      i += 1
    }
    java.util.Arrays.sort(terms)
    var s = 0.0
    t = 0
    while (t < nTerms) { s += terms(t); t += 1 }
    InternalRow(nGrams, s)
  }

  /** builder surface: dsir_terms(tokens, ratios) with the fitted ratio
    * table passed as a foldable array-of-literals (the query-fit data
    * constant-folds into the plan — the st10 stream ships its scores).
    */
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dsir_terms"),
    new ExpressionInfo(classOf[DsirScore].getName, "dsir_terms"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "dsir_terms takes (tokens, ratios array literal)")
      require(children(1).foldable, "dsir_terms: ratios must be a literal")
      val arr = children(1).eval(null).asInstanceOf[ArrayData]
      // r14 advice: an empty (or null) ratio table passes foldability and
      // then divides by zero per row in bucketOf — fail at plan time
      require(arr != null && arr.numElements() > 0,
        "dsir_terms: ratios must be a non-empty array literal")
      DsirScore(children.head, arr.toDoubleArray().toVector)
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
