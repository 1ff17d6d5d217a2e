package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY §7.4): the join/aggregation shapes that keep
  * working when one key is hot or both sides are fact-sized.
  *
  *   - [[saltedJoin]] — explicit skew mitigation for the case AQE's
  *     runtime skew-split cannot reach (e.g. skewed AGGREGATION input or
  *     non-sort-merge plans): the hot side's key is salted into
  *     `saltFactor` sub-keys and the other side is replicated across
  *     them, so a single hot key spreads over `saltFactor` reducers.
  *   - [[approxDistinct]] — HyperLogLog++ count-distinct: mergeable
  *     sketch, constant memory per group, the 100 TB path where exact
  *     `countDistinct`'s expand-shuffle is unaffordable (A19).
  */
object Scale {

  /** join `big` (skewed on `key`) with `small`, salting the hot side.
    * `small` is replicated `saltFactor`× — keep it dimension-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** per-group HLL distinct counts with the standard-error knob exposed */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.01): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_$valueCol"))
}
