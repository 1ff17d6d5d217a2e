package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL random-hyperplane LSH bucket strings
  * of an embedding vector in one fused pass — the banding step under
  * the entire vector family (lshNearDup, knnGraph and its community /
  * refresh consumers, SemDeDup, the st12 streaming ingest gate).
  *
  * The previous formulation built each of the nBands × bitsPerBand
  * (default 4 × 16 = 64) projections as
  * `aggregate(zip_with(v, ±1-literal, _*_), 0.0, _+_)` — higher-order
  * functions evaluate OUTSIDE whole-stage codegen with one interpreted
  * lambda dispatch per ELEMENT, so every row paid 64 planes × 64
  * components × 2 lambdas ≈ 8k megamorphic interpreter calls (the same
  * disease the x26 lang-ID fold had, at double the call volume). This
  * expression holds the md5-seeded ±1 weight tensor
  * ([[graft.llm.Similarity.hyperplanes]] — identical derivation) as one
  * flat int[] reference and emits the nBands bucket strings from a
  * single codegen'd triple loop.
  *
  * Bit-identical to the HOF composition (spec-pinned):
  *   - each projection accumulates LEFT-TO-RIGHT in doubles from 0.0
  *     (`acc + v[c]·w[c]`, w ∈ {−1, +1} so the product is an exact sign
  *     flip), bit = `proj >= 0.0` → '1' else '0';
  *   - a null ELEMENT or a length ≠ dim made every zip_with product
  *     chain null, so every `when(proj >= 0.0, ...)` fell to '0' —
  *     reproduced as the all-zero bucket array;
  *   - NaN projections are '1': Spark SQL orders NaN ABOVE every
  *     double (unlike Java's always-false NaN comparisons), so the
  *     Catalyst `proj >= 0.0` was true — the loop tests
  *     `acc >= 0.0 || isNaN(acc)` (spec-caught, not guessed).
  * Null INPUT array → null here; [[graft.llm.Similarity]] coalesces to
  * the all-zero array (what `when` on a null projection produced).
  */
case class HyperplaneBuckets(child: Expression, nBands: Int,
    bitsPerBand: Int, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets requires array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** flat ±1 weight tensor, plane-major: w[((b·bits)+j)·dim + c] —
    * the exact [[graft.llm.Similarity.hyperplanes]] bytes; built once
    * per (de)serialized expression instance, shipped to codegen as one
    * reference object.
    */
  @transient private lazy val weights: Array[Int] = {
    val planes = graft.llm.Similarity.hyperplanes(nBands, bitsPerBand, dim)
    val w = new Array[Int](nBands * bitsPerBand * dim)
    var off = 0
    planes.foreach(_.foreach { p =>
      System.arraycopy(p, 0, w, off, dim)
      off += dim
    })
    w
  }

  private def allZero: GenericArrayData = {
    val z = UTF8String.fromString("0" * bitsPerBand)
    new GenericArrayData(Array.fill[Any](nBands)(z))
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return allZero
    val vv = new Array[Double](dim)
    var c = 0
    while (c < dim) {
      if (arr.isNullAt(c)) return allZero
      vv(c) = arr.getDouble(c)
      c += 1
    }
    val w = weights
    val out = new Array[Any](nBands)
    val buf = new Array[Byte](bitsPerBand)
    var off = 0
    var b = 0
    while (b < nBands) {
      var j = 0
      while (j < bitsPerBand) {
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += vv(i) * w(off + i); i += 1 }
        buf(j) = if (acc >= 0.0 || java.lang.Double.isNaN(acc)) '1' else '0'
        off += dim
        j += 1
      }
      out(b) = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, bitsPerBand))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val vv = ctx.freshName("vv")
      val out = ctx.freshName("out")
      val buf = ctx.freshName("buf")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val w = ctx.addReferenceObj("weights", weights, "int[]")
      val zero = ctx.addReferenceObj("allZero", allZero, gad)
      s"""
        final int $n = $a.numElements();
        boolean $bad = ($n != $dim);
        final double[] $vv = new double[$dim];
        if (!$bad) {
          for (int $i = 0; $i < $dim; $i++) {
            if ($a.isNullAt($i)) { $bad = true; break; }
            $vv[$i] = $a.getDouble($i);
          }
        }
        if ($bad) {
          ${ev.value} = $zero;
        } else {
          final Object[] $out = new Object[$nBands];
          final byte[] $buf = new byte[$bitsPerBand];
          int $off = 0;
          for (int $b = 0; $b < $nBands; $b++) {
            for (int $j = 0; $j < $bitsPerBand; $j++) {
              double $acc = 0.0;
              for (int $i = 0; $i < $dim; $i++) {
                $acc += $vv[$i] * $w[$off + $i];
              }
              $buf[$j] = ($acc >= 0.0 || Double.isNaN($acc))
                ? (byte) '1' : (byte) '0';
              $off += $dim;
            }
            $out[$b] = $utf8.fromBytes(
              java.util.Arrays.copyOf($buf, $bitsPerBand));
          }
          ${ev.value} = new $gad($out);
        }
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}

object HyperplaneBuckets {

  /** SQL surface: hyperplane_buckets(v, nBands, bitsPerBand, dim) with
    * the three geometry arguments required foldable integer literals.
    */
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_buckets"),
    new ExpressionInfo(classOf[HyperplaneBuckets].getName,
      "hyperplane_buckets"),
    (children: Seq[Expression]) => {
      require(children.size == 4,
        "hyperplane_buckets takes (v, nBands, bitsPerBand, dim)")
      def lit(e: Expression, name: String): Int = {
        require(e.foldable, s"hyperplane_buckets: $name must be a literal")
        e.eval(null) match {
          case i: Int => i
          case o => o.toString.toInt
        }
      }
      HyperplaneBuckets(children.head, lit(children(1), "nBands"),
        lit(children(2), "bitsPerBand"), lit(children(3), "dim"))
    })

  /** per-session registration (the [[CosineSim.register]] path) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
