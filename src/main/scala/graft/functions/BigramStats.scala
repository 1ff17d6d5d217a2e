package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's bigram repetition statistics
  * — (top_bigram, top_bigram_n, dup_n) — in ONE in-row pass over the
  * token array.
  *
  * The previous formulation ([[graft.llm.TextOps.repetitionSignals]])
  * exploded per-doc bigrams and paid TWO corpus-sized shuffles for what
  * is a per-document pure function: groupBy(doc_id, bigram) counts,
  * then a groupBy(doc_id) min_by/max/sum rollup. This expression builds
  * the bigrams (concat_ws semantics: a null token is skipped with its
  * separator), sorts its scratch array (binary UTF8 order — the same
  * total order `min_by(struct(-c, bigram))` resolves ties with), and
  * walks the runs once:
  *   - top_bigram = the bigram of the longest run, ties to the
  *     BINARY-SMALLEST (the first maximal run in sorted order —
  *     exactly the grouped path's (c desc, bigram asc) winner);
  *   - top_bigram_n = that run length (the grouped max(c));
  *   - dup_n = Σ{run : run ≥ 2} (the grouped conditional sum, and
  *     [[DupBigramCount]]'s value).
  * Fewer than 2 tokens, or a null token array, → null struct — the
  * grouped path's left-join MISS, which the caller's coalesce already
  * maps to (null, 0, 0).
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bigram_stats requires array<string>, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("top_bigram", StringType, nullable = true),
    StructField("top_n", LongType, nullable = false),
    StructField("dup_n", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    BigramStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bs = BigramStats.getClass.getName.stripSuffix("$") // static forwarder (r15: janino cannot see MODULE$ on the companion CLASS - 26 silent interpreted fallbacks per Verify run)
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
          $bs.compute($a);
        ${ev.isNull} = (${ev.value} == null);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): BigramStats = copy(child = newChild)
}

object BigramStats {

  private val Space: Byte = ' '

  /** shared per-row computation; returns null for < 2 tokens (the
    * grouped path's left-join miss).
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n < 2) return null
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val bgs = new Array[UTF8String](n - 1)
    i = 0
    while (i < n - 1) {
      val a0 = toks(i); val a1 = toks(i + 1)
      val g =
        if (a0 == null && a1 == null) Array.emptyByteArray
        else if (a0 == null) a1
        else if (a1 == null) a0
        else {
          val b = new Array[Byte](a0.length + a1.length + 1)
          System.arraycopy(a0, 0, b, 0, a0.length)
          b(a0.length) = Space
          System.arraycopy(a1, 0, b, a0.length + 1, a1.length)
          b
        }
      bgs(i) = UTF8String.fromBytes(g)
      i += 1
    }
    java.util.Arrays.sort(bgs.asInstanceOf[Array[AnyRef]])
    var top: UTF8String = null
    var topN = 0L
    var dup = 0L
    var run = 0L
    var prev: UTF8String = null
    i = 0
    while (i < n - 1) {
      val cur = bgs(i)
      if (prev != null && cur.equals(prev)) run += 1
      else {
        if (run > topN) { topN = run; top = prev }
        if (run >= 2) dup += run
        run = 1
      }
      prev = cur
      i += 1
    }
    if (run > topN) { topN = run; top = prev }
    if (run >= 2) dup += run
    InternalRow(top, topN, dup)
  }

  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bigram_stats"),
    new ExpressionInfo(classOf[BigramStats].getName, "bigram_stats"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "bigram_stats takes exactly 1 argument")
      BigramStats(children.head)
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
