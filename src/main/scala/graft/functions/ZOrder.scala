package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleaving for multi-dimensional data
  * clustering — the layout transform behind Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`
  * and every lakehouse's multi-column clustering story. Sorting rows by
  * the interleaved code keeps rows close in BOTH dimensions close in
  * the file order, so per-file min/max column statistics stay tight on
  * every z-ordered column at once and a 100 TB scan with a predicate on
  * EITHER column prunes most files (vs a lexicographic sort, which only
  * prunes on the leading column).
  *
  * The bit-spreading uses the public parallel-prefix masks (Sean
  * Anderson's Bit Twiddling Hacks, "Interleave bits by Binary Magic
  * Numbers") over the LOW 31 BITS of each input — a 62-bit code with
  * the sign bit never set, so Long comparisons order the same way in
  * every engine and no shift touches bit 63.
  */
object ZOrderBits {

  /** spread the low 31 bits of `v` to even bit positions */
  def spread31(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** interleave the low 31 bits of a (even positions) and b (odd) */
  def interleave31(a: Long, b: Long): Long =
    spread31(a) | (spread31(b) << 1)
}

/** `zorder2(a, b)` — the 62-bit Morton code of two int/long columns, as
  * a native codegen'd expression (no UDF, no serde; stays inside
  * whole-stage codegen). Values are masked to their low 31 bits, so
  * callers normalize first (rank, bucket, epoch-second, or `& 0x7FFFFFFF`
  * — the usual z-order discipline of interleaving NORMALIZED keys).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires int/long columns, got ($l, $r)")
    }
  override def dataType: DataType = LongType

  private def asLong(a: Any): Long = a match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderBits.interleave31(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderBits$$.MODULE$$.interleave31((long) $a, (long) $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("zorder2"),
    new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "zorder2 takes exactly 2 arguments")
      ZOrder2(children.head, children(1))
    })

  /** per-session registration (mirrors [[IcebergHash.register]]) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
