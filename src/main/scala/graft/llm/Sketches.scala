package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus-scale token statistics.
  *
  * Count-Min (Cormode & Muthukrishnan 2005) is THE mergeable shape for
  * heavy-hitter mining at 100 TB: the sketch is a d×w counter grid whose
  * cells add, so map-side partial aggregation reduces every partition to
  * ≤ d·w rows before the shuffle, and two corpus shards' sketches merge
  * by cell-wise addition — the property exact per-token counts lack when
  * the vocabulary itself is huge (URLs, n-grams, typos).
  *
  * All row hashes are md5-derived via [[Sampling.hashU32]] (positional
  * hex-digit arithmetic), so the sketch — and every estimate read from
  * it — is bit-identical in any engine; no RNG, no seed-dependent JVM
  * hashing.
  */
object Sketches {

  /** sketch geometry: 4 independent rows × 1024 columns — error bound
    * e·N/w per row, min over 4 rows; enough for the φ=1% heavy-hitter
    * audit below and small enough to broadcast (4k longs)
    */
  val CmsDepth = 4
  val CmsWidth = 1024

  private def cmsCol(tok: Column, r: Int): Column =
    pmod(Sampling.hashU32(tok, s"cms$r"), lit(CmsWidth.toLong))

  /** one (r, c) coordinate struct per sketch row for a token */
  private def cmsCoords(tok: Column): Column = array(
    (0 until CmsDepth).map(r =>
      struct(lit(r).as("r"), cmsCol(tok, r).as("c"))): _*)

  /** φ-heavy-hitter audit over the token stream: build the CMS, read
    * every distinct token's estimate back out of it, and report it next
    * to the exact count — `est >= true` always (CMS never underestimates)
    * and `heavy` uses the classic relative threshold est >= φ·N.
    *
    * Scale shape: the sketch build is tokens → ×d coordinate explode →
    * ONE hash agg whose map-side combine caps partials at d·w cells —
    * the output is ≤ 4096 rows regardless of corpus size and broadcasts
    * to the probe join. The probe side shuffles only on `tok` (the same
    * key the exact-count audit needs anyway; a production run at 100 TB
    * would probe only candidate tokens and skip the exact counts — the
    * sketch exists so the full vocabulary never needs a shuffle).
    */
  def cmsHeavyHitters(docs: DataFrame, phiDen: Long = 100L): DataFrame = {
    val toks = docs.select(
      explode(split(col("text"), " ")).as("tok"))
    // exact per-token counts (the audit baseline) — one tok-keyed agg
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
    // sketch: explode each token into its d (row, col) cells, then one
    // partial-aggregating count — ≤ d·w distinct keys survive per task
    val sketch = toks
      .select(explode(cmsCoords(col("tok"))).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cell"))
    // probe: each distinct token reads its d cells; est = min over rows
    val est = exact
      .select(col("tok"), col("true_cnt"),
        explode(cmsCoords(col("tok"))).as("rc"))
      .join(broadcast(sketch),
        col("rc.r") === col("r") && col("rc.c") === col("c"))
      .groupBy(col("tok"), col("true_cnt"))
      .agg(min(col("cell")).as("est"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    est.join(broadcast(total))
      .select(col("tok"), col("est"), col("true_cnt"),
        (col("est") - col("true_cnt")).as("overcount"),
        // φ = 1/phiDen as INTEGER arithmetic: est·phiDen >= N — a
        // double φ would make the boundary case engine-dependent
        (col("est") * phiDen >= col("n_total")).as("heavy"))
  }
}
