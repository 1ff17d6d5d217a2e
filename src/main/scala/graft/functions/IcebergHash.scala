package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Iceberg-spec 32-bit Murmur3 hashing (SURVEY §7.5 item 6, r2 verdict
  * task 4): the partition `bucket[N]` transform is
  * `(murmur3_x86_32(bytes, seed=0) & Int.MaxValue) % N`, where int and
  * long values hash as their 8-byte little-endian encoding and strings as
  * UTF-8 bytes (Iceberg spec, Appendix B). Spark's own `hash()` is
  * murmur3 with seed 42 and a different long layout, so it is NOT
  * bucket-compatible — hence this small reference implementation.
  */
object IcebergMurmur {

  private val C1 = 0xcc9e2d51
  private val C2 = 0x1b873593

  private def mix(h0: Int, k0: Int): Int = {
    var k = k0 * C1
    k = Integer.rotateLeft(k, 15) * C2
    var h = h0 ^ k
    h = Integer.rotateLeft(h, 13)
    h * 5 + 0xe6546b64
  }

  private def fmix(h0: Int, len: Int): Int = {
    var h = h0 ^ len
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^ (h >>> 16)
  }

  /** murmur3_x86_32(little_endian_8_bytes(v), seed = 0) — the Iceberg
    * hash of int AND long values (ints widen to long first, so
    * bucket(34) == bucket(34L)).
    */
  def hashLong(v: Long): Int = {
    var h = mix(0, v.toInt)             // low 32 bits, little-endian first
    h = mix(h, (v >>> 32).toInt)        // high 32 bits
    fmix(h, 8)
  }

  /** murmur3_x86_32(bytes, seed = 0) — general byte-string form (Iceberg
    * string/binary hashing; driver-side only, not needed in a plan).
    */
  def hashBytes(data: Array[Byte]): Int = {
    val nBlocks = data.length / 4
    var h = 0
    var i = 0
    while (i < nBlocks) {
      val o = i * 4
      val k = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
        ((data(o + 2) & 0xff) << 16) | ((data(o + 3) & 0xff) << 24)
      h = mix(h, k)
      i += 1
    }
    // tail (1-3 bytes): mixed without the h-mutation step
    var k1 = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 = (data(tail + 2) & 0xff) << 16
        k1 |= (data(tail + 1) & 0xff) << 8; k1 |= data(tail) & 0xff
      case 2 =>
        k1 = (data(tail + 1) & 0xff) << 8; k1 |= data(tail) & 0xff
      case 1 => k1 = data(tail) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
      h ^= k1
    }
    fmix(h, data.length)
  }

  def hashString(s: String): Int =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** `iceberg_hash(col)` — the Iceberg-spec murmur3 of an int/long column,
  * as a native codegen'd expression (no UDF, no serde; stays inside
  * whole-stage codegen). `bucket[N]` composes as
  * `(iceberg_hash(c) & 2147483647) % N` in plain column arithmetic.
  */
case class IcebergHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"iceberg_hash requires an int/long column, got $t")
  }
  override def dataType: DataType = IntegerType

  private def asLong(a: Any): Long = a match {
    case i: Int => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(a: Any): Any = IcebergMurmur.hashLong(asLong(a))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.IcebergMurmur$$.MODULE$$.hashLong((long) $c);")

  override protected def withNewChildInternal(
      newChild: Expression): IcebergHash = copy(child = newChild)
}

object IcebergHash {
  val info: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("iceberg_hash"),
    new ExpressionInfo(classOf[IcebergHash].getName, "iceberg_hash"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "iceberg_hash takes exactly 1 argument")
      IcebergHash(children.head)
    })

  /** per-session registration (the extension-less path, mirrors
    * [[CosineSim.register]])
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      info._1, info._2, info._3)
}
