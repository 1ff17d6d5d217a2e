package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the duplicate-BIGRAM occurrence count
  * `Σ{c : c ≥ 2}` over a token array's adjacent-pair counts — the x26
  * quality gate's repetition signal, fused into ONE call per row.
  *
  * The previous formulation paid three interpreted steps per row
  * (higher-order functions evaluate outside whole-stage codegen, one
  * lambda dispatch per ELEMENT): `transform(sequence(...))` building
  * the bigram strings, `array_sort` over them, and the `aggregate` run
  * fold. This expression takes the TOKEN array directly: it
  * materializes the n−1 bigrams (`UTF8String.concat`, the same
  * `tok[i] ⊔ " " ⊔ tok[i+1]` bytes the oracle hashes — tokens are
  * split on the space, so the concat map is injective and
  * equality-grouping is exact), sorts its own scratch array
  * (`java.util.Arrays.sort`, binary order — the count is
  * order-invariant, so ANY total order groups equal values), and
  * counts runs ≥ 2 in one pass, all inside the fused codegen stage.
  *
  * < 2 tokens → 0 (no bigrams). Null array → null, null element →
  * null (the [[CosineSim]] discipline).
  */
case class DupBigramCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"dup_bigram_count requires array<string>, got $t")
    }
  override def dataType: DataType = LongType

  private val Space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return 0L
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    val bgs = new Array[UTF8String](n - 1)
    i = 0
    while (i < n - 1) {
      bgs(i) = UTF8String.concat(toks(i), Space, toks(i + 1))
      i += 1
    }
    java.util.Arrays.sort(bgs.asInstanceOf[Array[AnyRef]])
    var acc = 0L
    var run = 0
    var prev: UTF8String = null
    i = 0
    while (i < n - 1) {
      val cur = bgs(i)
      if (prev != null && cur.equals(prev)) run += 1
      else { if (run >= 2) acc += run; run = 1 }
      prev = cur
      i += 1
    }
    if (run >= 2) acc += run
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      val nullElem = ctx.freshName("nullElem")
      val toks = ctx.freshName("toks")
      val bgs = ctx.freshName("bgs")
      val utf8 = classOf[UTF8String].getName
      val space = ctx.addReferenceObj("space", Space, utf8)
      s"""
        final int $n = $a.numElements();
        boolean $nullElem = false;
        long $acc = 0L;
        if ($n >= 2) {
          final $utf8[] $toks = new $utf8[$n];
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i)) { $nullElem = true; break; }
            $toks[$i] = $a.getUTF8String($i);
          }
          if (!$nullElem) {
            final $utf8[] $bgs = new $utf8[$n - 1];
            for (int $i = 0; $i < $n - 1; $i++) {
              $bgs[$i] = $utf8.concat($toks[$i], $space, $toks[$i + 1]);
            }
            java.util.Arrays.sort($bgs);
            int $run = 0;
            $utf8 $prev = null;
            for (int $i = 0; $i < $n - 1; $i++) {
              final $utf8 $cur = $bgs[$i];
              if ($prev != null && $cur.equals($prev)) { $run += 1; }
              else { if ($run >= 2) $acc += $run; $run = 1; }
              $prev = $cur;
            }
            if ($run >= 2) $acc += $run;
          }
        }
        if ($nullElem) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): DupBigramCount = copy(child = newChild)
}

object DupBigramCount {
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dup_bigram_count"),
    new ExpressionInfo(classOf[DupBigramCount].getName, "dup_bigram_count"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "dup_bigram_count takes exactly 1 argument")
      DupBigramCount(children.head)
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
