package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns (SURVEY §4 custom-work item 2: the codegen
  * upgrade of the `zip_with`/`aggregate` formulation once the higher-order
  * path is the measured hot spot).
  *
  * Semantics are BIT-IDENTICAL to the composed form used by
  * [[graft.llm.Similarity.cosine]]: one left-to-right pass accumulating
  * dot/norm² from 0.0, result `dot / (sqrt(na) * sqrt(nb))` — so the
  * DuckDB oracles keep matching exactly. Unlike the higher-order version,
  * this stays inside whole-stage codegen with a single fused loop and no
  * per-element lambda invocation or intermediate arrays.
  *
  * Null in, null out — including null ELEMENTS: an input array containing
  * a null element yields a null score (r4 advice; previously getDouble
  * silently read 0.0). Arrays must have equal length (analysis-time types
  * are enforced, runtime length mismatch raises).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"cosine_sim: length mismatch ${y.numElements()} vs $n")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nullElem = ctx.freshName("nullElem")
      s"""
        final int $n = $a.numElements();
        if ($b.numElements() != $n) {
          throw new IllegalArgumentException(
            "cosine_sim: length mismatch " + $b.numElements() + " vs " + $n);
        }
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        boolean $nullElem = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $nullElem = true; break; }
          final double $xi = $a.getDouble($i);
          final double $yi = $b.getDouble($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        if ($nullElem) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** register `cosine_sim(a, b)` in the session's function registry so it
    * is usable from SQL and `expr(...)` (the SparkSessionExtensions-less
    * path that works on a plain session)
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(children.head, children(1))
      })
}
