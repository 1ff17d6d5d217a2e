package graft.meta

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-transform EVALUATION (SURVEY §1.1/§7.5.6, r2 verdict task 4):
  * the reference renders transforms as strings (`src/data.rs:124-149`,
  * re-expressed by [[MetaOps.partitionResolve]]/m15); this module answers
  * the companion question "which partition value does this row get?",
  * per the Iceberg spec:
  *
  *   - identity   → the value
  *   - bucket[N]  → `(murmur3_x86_32(le_bytes(v), seed 0) & MaxInt) % N`
  *                  via the native [[graft.functions.IcebergHash]]
  *   - truncate[W]→ numbers: `v - (v mod W)` (floor to multiple, spec'd
  *                  for negatives); strings: first W chars
  *   - year/month → whole years / months since epoch (1970)
  *   - day        → days since epoch; hour → hours since epoch
  *   - void       → null
  *
  * Everything is plain column arithmetic on codegen'd built-ins (the one
  * custom piece, the hash, is itself a codegen'd Expression) — evaluating
  * a partition value for 10^12 rows is a pure map.
  */
object Transforms {

  /** Iceberg bucket[n] over an int/long column. `iceberg_hash` resolves
    * from the function registry at analysis time — sessions built from
    * [[graft.core.GraftSession]] have it injected; other sessions call
    * [[graft.functions.IcebergHash.register]] first. The hash is already
    * non-negative after the &, so `%` needs no pmod.
    */
  def bucket(c: Column, n: Int): Column = {
    require(n > 0, s"bucket[$n]: bucket count must be positive")
    call_function("iceberg_hash", c).bitwiseAND(lit(Int.MaxValue)) % lit(n)
  }

  /** whole years since 1970 */
  def yearT(ts: Column): Column = year(ts) - 1970

  /** whole months since 1970-01 */
  def monthT(ts: Column): Column = (year(ts) - 1970) * 12 + (month(ts) - 1)

  /** days since epoch */
  def dayT(ts: Column): Column = datediff(to_date(ts), lit("1970-01-01"))

  /** hours since epoch: seconds of the hour-truncated timestamp are an
    * exact multiple of 3600 < 2^53, so the double division is exact
    */
  def hourT(ts: Column): Column =
    (unix_seconds(date_trunc("hour", ts)) / lit(3600)).cast("long")

  /** truncate[w] for integral columns: floor to a multiple of w (pmod is
    * non-negative, so negatives floor DOWN per the Iceberg spec)
    */
  def truncLong(c: Column, w: Int): Column = c - pmod(c, lit(w.toLong))

  /** truncate[w] for strings: first w characters */
  def truncString(c: Column, w: Int): Column = substring(c, 1, w)

  def voidT: Column = lit(null).cast("int")

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  /** evaluate a rendered transform tag (the string form the partition-spec
    * fixtures / [[MetaOps.partitionResolve]] carry) against a source
    * column — the row→partition-value answer for a spec row.
    */
  def eval(transform: String, c: Column,
      sourceIsString: Boolean = false): Column = transform match {
    case "identity" => c
    case BucketRe(n) => bucket(c, n.toInt)
    case TruncRe(w) =>
      if (sourceIsString) truncString(c, w.toInt) else truncLong(c, w.toInt)
    case "year" => yearT(c)
    case "month" => monthT(c)
    case "day" => dayT(c)
    case "hour" => hourT(c)
    case "void" => voidT
    case other => throw new IllegalArgumentException(
      s"unknown partition transform: $other")
  }
}
