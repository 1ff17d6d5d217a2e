package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's DISTINCT winnowing
  * fingerprints (Schleimer–Wilkerson–Aiken, SIGMOD'03) in ONE in-row
  * pass — character k-gram md5 hashes, the w-wide sliding-window min
  * (monotonic deque, O(grams)), and the distinct set.
  *
  * The previous formulation ([[graft.llm.TextOps.winnowFingerprints]])
  * paid an explicit repartition SHUFFLE, a per-gram explode (one row
  * per character position), and a doc-keyed SORT for the rowsBetween
  * window — corpus-sized machinery for a per-document pure function
  * (the minhash_bands lesson on the winnowing family, x18/x21).
  *
  * Bit-identical fingerprint SETS (spec-pinned):
  *   - grams: `substr(text, pos, k)` for pos 1..charLen−k+1 (SQL
  *     character semantics — substringSQL, not bytes);
  *   - h: the gram md5's first 4 bytes as unsigned — exactly
  *     `conv(substring(md5(g), 1, 8), 16, 10)`;
  *   - windows: every full w-gram window's min; a doc with fewer than
  *     w grams keeps its single all-grams window (the old
  *     `pos <= n-(w-1) OR (n < w AND pos = 1)` filter);
  *   - output: the DISTINCT mins (the old frame-level .distinct()),
  *     ascending for determinism of the array form (consumers explode
  *     and re-aggregate, so order never reaches a result).
  * Fewer than k characters → empty array (the old char_length filter's
  * dropped row); null text → null.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires string, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    WinnowFps.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wf = WinnowFps.getClass.getName.stripSuffix("$") // static forwarder (r15: janino cannot see MODULE$ on the companion CLASS - 26 silent interpreted fallbacks per Verify run)
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $wf.compute($a, $k, $w);
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFps = copy(child = newChild)
}

object WinnowFps {

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val nChars = text.numChars()
    if (nChars < k) return Empty
    val g = nChars - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](g)
    var p = 0
    while (p < g) {
      md.reset()
      val d = md.digest(text.substringSQL(p + 1, k).getBytes)
      hs(p) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      p += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    if (g < w) {
      var m = Long.MaxValue
      p = 0
      while (p < g) { if (hs(p) < m) m = hs(p); p += 1 }
      out.add(m)
    } else {
      // monotonic deque of indices: front = min of the current window
      val dq = new Array[Int](g)
      var head = 0
      var tail = 0 // exclusive
      p = 0
      while (p < g) {
        while (tail > head && hs(dq(tail - 1)) >= hs(p)) tail -= 1
        dq(tail) = p; tail += 1
        if (dq(head) <= p - w) head += 1
        if (p >= w - 1) out.add(hs(dq(head)))
        p += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "winnow_fps takes (text, k, w)")
      def intLit(e: Expression, name: String): Int = {
        require(e.foldable, s"winnow_fps: $name must be a literal")
        e.eval(null).asInstanceOf[Number].intValue()
      }
      WinnowFps(children.head, intLit(children(1), "k"),
        intLit(children(2), "w"))
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
