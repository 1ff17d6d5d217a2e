package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the stopword-vote language winner over a
  * token array — the x26/st13 quality gate's lang-ID signal, fused into
  * ONE pass per row.
  *
  * The previous formulation folded five `filter(tk, t =>
  * array_contains(words, t))` calls (one per language) into a strict-`>`
  * struct fold. Higher-order functions evaluate OUTSIDE whole-stage
  * codegen — each dispatches an interpreted lambda per ELEMENT, so every
  * token paid 5 lambda dispatches × a 7-element array scan, and the
  * megamorphic interpreter call sites made the wall JIT-luck-dependent
  * (measured 2–3× swings between identical ×30 stream runs). This
  * expression walks the token array once: each token is one hash lookup
  * into a token → language-bitmask map (35 entries, overlaps like
  * es/fr "la"/"de"/"un" carried in the mask), hits accumulate per
  * language, and the winner is the strict-`>` argmax in ascending
  * language order — BIT-IDENTICAL to the fold: first language wins
  * ties, zero hits everywhere stays "unknown" (spec-pinned against the
  * fold composition on adversarial tie/overlap/unicode corpora).
  *
  * Null array → null (callers coalesce to "unknown", matching the
  * fold's behavior on a null token array); null ELEMENTS are skipped —
  * exactly what `array_contains(ws, null) → null → filter drops` did.
  */
case class LangBest(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lang_best requires array<string>, got $t")
    }
  override def dataType: DataType = StringType

  import LangBest.{Langs, Mask, Unknown}

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hits = new Array[Int](Langs.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = Mask.get(arr.getUTF8String(i))
        if (m != null) {
          val mm = m.intValue()
          var l = 0
          while (l < Langs.length) {
            hits(l) += (mm >> l) & 1
            l += 1
          }
        }
      }
      i += 1
    }
    var bestH = 0
    var bestI = -1
    var l = 0
    while (l < Langs.length) {
      if (hits(l) > bestH) { bestH = hits(l); bestI = l }
      l += 1
    }
    if (bestI < 0) Unknown else Langs(bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val hits = ctx.freshName("hits")
      val m = ctx.freshName("m")
      val mm = ctx.freshName("mm")
      val l = ctx.freshName("l")
      val bestH = ctx.freshName("bestH")
      val bestI = ctx.freshName("bestI")
      val utf8 = classOf[UTF8String].getName
      val mask = ctx.addReferenceObj("mask", Mask, "java.util.HashMap")
      val langs = ctx.addReferenceObj("langs", Langs, s"$utf8[]")
      val unknown = ctx.addReferenceObj("unknown", Unknown, utf8)
      val nLangs = Langs.length
      s"""
        final int $n = $a.numElements();
        final int[] $hits = new int[$nLangs];
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            final Integer $m = (Integer) $mask.get($a.getUTF8String($i));
            if ($m != null) {
              final int $mm = $m.intValue();
              for (int $l = 0; $l < $nLangs; $l++) {
                $hits[$l] += ($mm >> $l) & 1;
              }
            }
          }
        }
        int $bestH = 0;
        int $bestI = -1;
        for (int $l = 0; $l < $nLangs; $l++) {
          if ($hits[$l] > $bestH) { $bestH = $hits[$l]; $bestI = $l; }
        }
        ${ev.value} = ($bestI < 0) ? $unknown : $langs[$bestI];
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): LangBest = copy(child = newChild)
}

object LangBest {

  /** the lang-ID stopword table — the SAME (language, words) pairs as
    * [[graft.llm.TextOps.stopwords]] and the quality gate's former fold,
    * in ascending language order (the tie-break order).
    */
  val LangWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  private[functions] val Langs: Array[UTF8String] =
    LangWords.map(p => UTF8String.fromString(p._1)).toArray

  private[functions] val Unknown: UTF8String = UTF8String.fromString("unknown")

  /** token → bitmask of languages claiming it (bit l = Langs(l));
    * java.util.HashMap so the codegen path shares the exact object.
    */
  private[functions] val Mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    LangWords.zipWithIndex.foreach { case ((_, ws), l) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf(if (prev == null) 1 << l
          else prev.intValue() | (1 << l)))
      }
    }
    m
  }

  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lang_best"),
    new ExpressionInfo(classOf[LangBest].getName, "lang_best"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "lang_best takes exactly 1 argument")
      LangBest(children.head)
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
