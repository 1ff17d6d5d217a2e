package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry in [[queries]] is a function `(spark, sfDir) => DataFrame`
  * over the TESTDATA parquet tables; where the semantics are ANSI-SQL
  * expressible, [[oracles]] carries the DuckDB-equivalent SQL keyed by the
  * same name (column aliases MUST match — the driver sorts columns by name
  * before hashing). Queries without an oracle get a rows-only check.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object QueryPack {

  /** Cross-engine numeric determinism helpers.
    *
    * Double-precision aggregation order differs between Spark and DuckDB,
    * so money-style aggregates are computed in exact DECIMAL and only the
    * final value is cast to DOUBLE — decimal→double conversion is the same
    * IEEE rounding in both engines, giving bit-exact results without
    * round()-boundary risk.
    */
  object dec {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._

    /** exact decimal view of a 2-decimal money/rate double column */
    def d2(c: Column): Column = c.cast("decimal(18,2)")

    /** exact sum of a 2-decimal column, as double */
    def sumD2(c: Column): Column = sum(d2(c)).cast("double")

    /** exact avg = double(sum_decimal) / double(count): IEEE-deterministic */
    def avgD2(c: Column): Column =
      sum(d2(c)).cast("double") / count(c).cast("double")
  }
}
