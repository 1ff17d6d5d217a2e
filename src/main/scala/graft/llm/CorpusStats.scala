package graft.llm

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Type-safe corpus statistics via a custom [[Aggregator]] (SURVEY §2.11
  * X6's UDAF surface): a single mergeable buffer carrying Welford-style
  * moments + extrema of document lengths, usable as a `TypedColumn` over
  * `Dataset[Doc]` or registered as a SQL UDAF. The buffer is constant
  * size and merges associatively — the distributed-aggregation contract
  * (partial per partition, merge at the reducer).
  */
object CorpusStats {

  case class LenBuf(n: Long, sum: Double, sumSq: Double, min: Long, max: Long)

  case class LenStats(
      n_docs: Long, mean_len: Double, var_len: Double,
      min_len: Long, max_len: Long)

  /** moments over a Long measure (e.g. document character length) */
  val lengthStats: Aggregator[Long, LenBuf, LenStats] =
    new Aggregator[Long, LenBuf, LenStats] {
      override def zero: LenBuf = LenBuf(0L, 0.0, 0.0, Long.MaxValue, Long.MinValue)
      override def reduce(b: LenBuf, v: Long): LenBuf =
        LenBuf(b.n + 1, b.sum + v, b.sumSq + v.toDouble * v,
          math.min(b.min, v), math.max(b.max, v))
      override def merge(a: LenBuf, b: LenBuf): LenBuf =
        LenBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq,
          math.min(a.min, b.min), math.max(a.max, b.max))
      override def finish(b: LenBuf): LenStats =
        if (b.n == 0) LenStats(0L, 0.0, 0.0, 0L, 0L)
        else LenStats(b.n, b.sum / b.n,
          (b.sumSq - b.sum * b.sum / b.n) / math.max(1L, b.n - 1), b.min, b.max)
      override def bufferEncoder: Encoder[LenBuf] = Encoders.product[LenBuf]
      override def outputEncoder: Encoder[LenStats] = Encoders.product[LenStats]
    }
}
