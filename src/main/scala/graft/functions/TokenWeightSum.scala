package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the weighted-token accumulation of the
  * x66 linear classifier — `Σ_token w(token)` plus the vocabulary hit
  * count, in ONE fused pass over the bound token array.
  *
  * The composed form (`aggregate` fold with two `element_at` map-literal
  * lookups per element) is an interpreted higher-order function: no
  * whole-stage codegen, one lambda dispatch per element, and Catalyst's
  * `GetMapValue` on a map literal is a LINEAR key scan — measured 7.8×
  * DuckDB at the ×30 amplified corpus where the join-free shape should
  * win. This expression builds a `java.util.HashMap` from the foldable
  * weight-map literal ONCE (driver-side, shipped as a codegen reference
  * object) and accumulates both the weight sum and the hit count in a
  * single compiled loop — O(1) probes, zero interpretation, same
  * integer-exact result.
  *
  * Second child MUST be a foldable map<string,long> (the model — KBs,
  * a literal by construction). Null array → null, null element → null
  * (the [[CosineSim]]/[[DupBigramCount]] discipline); tokens absent
  * from the vocabulary contribute nothing.
  */
case class TokenWeightSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), MapType(StringType, LongType, _))
          if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_weight_sum requires (array<string>, foldable " +
          s"map<string,long>), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))

  /** the literal model as an O(1)-probe table; keys cloned out of the
    * literal's backing buffer once
    */
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = right.eval(null).asInstanceOf[MapData]
    val n = m.numElements()
    val h = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    val ks = m.keyArray()
    val vs = m.valueArray()
    var i = 0
    while (i < n) {
      h.put(ks.getUTF8String(i).clone(), java.lang.Long.valueOf(vs.getLong(i)))
      i += 1
    }
    h
  }

  override def nullSafeEval(a: Any, unused: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0L
    var h = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val w = table.get(arr.getUTF8String(i))
      if (w != null) { s += w.longValue(); h += 1L }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s, h))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val w = ctx.freshName("w")
      val nullElem = ctx.freshName("nullElem")
      val tbl = ctx.addReferenceObj("weights", table, "java.util.HashMap")
      val rowCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      s"""
        final int $n = $a.numElements();
        boolean $nullElem = false;
        long $s = 0L;
        long $h = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $nullElem = true; break; }
          final java.lang.Long $w =
            (java.lang.Long) $tbl.get($a.getUTF8String($i));
          if ($w != null) { $s += $w.longValue(); $h += 1L; }
        }
        if ($nullElem) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = new $rowCls(new Object[]{$s, $h});
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenWeightSum =
    copy(left = newLeft, right = newRight)
}

object TokenWeightSum {
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_weight_sum"),
    new ExpressionInfo(classOf[TokenWeightSum].getName, "token_weight_sum"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "token_weight_sum takes exactly 2 arguments")
      TokenWeightSum(children.head, children(1))
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
