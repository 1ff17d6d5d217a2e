package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native cosine over int8-quantized codes (`array<int>`): the scoring
  * kernel of the quantized similarity scan (SURVEY §2.11 X4's scale
  * path). Dot and norms accumulate in LONG — exact integer arithmetic
  * (≤ 127²·dim ≪ 2^53), so the only floating-point ops are the final
  * casts, sqrts and divide, which every engine performs identically:
  * `(double)dot / (sqrt((double)na) * sqrt((double)nb))`.
  *
  * This replaces the r3 higher-order `zip_with`/`aggregate` formulation
  * whose interpreted lambdas were re-evaluated per join pair (r3 verdict
  * "What's wrong #1") — here the whole score is one fused loop inside
  * whole-stage codegen, like [[CosineSim]].
  *
  * Null in, null out — including null ELEMENTS (a quantized code array
  * carries a null element whenever the source embedding element was null;
  * r4 advice: previously getInt silently read it as 0, producing a
  * silently-wrong score). Zero codes give 0/0 = NaN (cos undefined),
  * matching the float path and the DuckDB oracle.
  */
case class CosineSimI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_i8 requires (array<int>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"cosine_sim_i8: length mismatch ${y.numElements()} vs $n")
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getInt(i).toLong; val yi = y.getInt(i).toLong
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
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
            "cosine_sim_i8: length mismatch " + $b.numElements() + " vs " + $n);
        }
        long $dot = 0L; long $na = 0L; long $nb = 0L;
        boolean $nullElem = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $nullElem = true; break; }
          final long $xi = (long) $a.getInt($i);
          final long $yi = (long) $b.getInt($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        if ($nullElem) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ((double) $dot)
            / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimI8 =
    copy(left = newLeft, right = newRight)
}

object CosineSimI8 {
  /** register `cosine_sim_i8(a, b)` in the session's function registry */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_sim_i8"),
      new ExpressionInfo(classOf[CosineSimI8].getName, "cosine_sim_i8"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim_i8 takes exactly 2 arguments")
        CosineSimI8(children.head, children(1))
      })
}
