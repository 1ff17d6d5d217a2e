package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end pipeline compositions — the "final SELECT" a training-data
  * run executes after the individual ops: which documents survive every
  * gate, and what the resulting mixture looks like per (source, split).
  */
object Pipeline {

  /** [[epochSchedule]] defaults, shared with the x70 oracle SQL (the
    * x37/DsirBuckets discipline: interpolated constants, so changing a
    * default here cannot silently desynchronize the oracle)
    */
  val EpochBudgetMult = 2.0
  val EpochMaxEpochs = 4.0

  /** training-mixture manifest: documents that survive the per-domain
    * cap ([[Sampling.domainCap]]) AND fuzzy eval-decontamination
    * ([[Dedup.fuzzyDecontam]] — the eval slice itself never trains),
    * assigned their reproducible split, rolled up to per-(source, split)
    * doc/token/char counts — the table a mixture-weighting step consumes.
    *
    * Scale shape: two left-semi joins on doc_id (each gate's output is
    * doc_id-keyed and corpus-proportional), the split hash is a pure
    * map, and the rollup shuffles only (source, split) partials — the
    * composition adds NOTHING beyond its parts' shuffles plus one
    * map-side-combined agg over ~|sources|·3 groups.
    */
  def manifest(docs: DataFrame): DataFrame = {
    val kept = Sampling.domainCap(docs)
      .filter(col("kept")).select(col("doc_id"))
    val clean = Dedup.fuzzyDecontam(docs)
      .filter(!col("contaminated")).select(col("doc_id"))
    docs
      .join(kept, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .select(col("source"),
        Sampling.hashSplit(col("doc_id"), "split").as("split"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("n_chars"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
  }

  /** incremental crawl-refresh pipeline — the composition the round's
    * delta operators exist FOR, in one query: [[Dedup.snapshotDiff]]
    * classifies every doc across crawl N → N+1; only the added+changed
    * DELTA (never the unchanged 100 TB) flows into
    * [[Dedup.bloomPreGate]] against the OLD corpus's content
    * fingerprints; and each doc gets its refresh `action`:
    *   - `skip`     — unchanged, already processed last crawl;
    *   - `forget`   — removed, downstream must drop it;
    *   - `drop_dup` — new/changed content that already exists verbatim
    *                  elsewhere in the old corpus (exact fp hit — the
    *                  Bloom maybe-set priced the check);
    *   - `ingest`   — genuinely new content → the downstream gates
    *                  (x50 near-dup, x26 quality, x57 embedding).
    *
    * Scale shape: the diff is one doc_id full-outer join of (doc_id,
    * fp) projections; the delta join is doc_id-keyed and
    * delta-proportional; the Bloom gate adds one broadcast position
    * join + one agg over the DELTA only. Work scales with the churn
    * rate, not the corpus — the whole point of a refresh pipeline.
    */
  def refreshPipeline(oldDocs: DataFrame, newDocs: DataFrame,
      mBits: Int = 65536, kHashes: Int = 3): DataFrame = {
    val diff = Dedup.snapshotDiff(oldDocs, newDocs)
    val delta = newDocs.join(
      diff.filter(col("status").isin("added", "changed"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val gated = Dedup.bloomPreGate(oldDocs, delta, mBits, kHashes)
      .select(col("doc_id"), col("maybe_dup"), col("is_dup"))
    diff.join(gated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("status"), col("maybe_dup"),
        col("is_dup"),
        when(col("status") === "unchanged", "skip")
          .when(col("status") === "removed", "forget")
          .when(coalesce(col("is_dup"), lit(false)), "drop_dup")
          .otherwise("ingest").as("action"))
  }

  /** mixture EPOCH scheduler — the step after the manifest: given the
    * per-source token counts, a temperature-flattened target mixture
    * (weight ∝ √n_tokens, the mBERT/XLM-R α=½ convention — x46's keep
    * gate solves the same imbalance by thinning; this one plans
    * repetition), and a token budget (`budgetMult` × the corpus), how
    * many EPOCHS of each source does the run take? Sources whose
    * target exceeds `maxEpochs` passes are capped (Muennighoff et al.
    * 2023: repeating beyond ~4 epochs stops helping), surfacing the
    * budget a re-balance would have to redistribute.
    *
    * Determinism: doc/token counts are integer aggs; √n is IEEE-exact;
    * the ONE order-sensitive double reduction (the weight normalizer
    * Z = Σ√n_s) folds a value-sorted collect_list — the x42/x43
    * sorted-fold discipline, mirrored `list_reduce(list_sort(...))`
    * in the oracle. Everything else is fixed-order per-row arithmetic.
    *
    * Scale shape: one map-side-combined agg over |sources| groups, a
    * 1-row broadcast of (Z, total), then a K-row projection — the
    * whole schedule is source-cardinality-sized, never corpus-sized.
    */
  def epochSchedule(docs: DataFrame,
      budgetMult: Double = Pipeline.EpochBudgetMult,
      maxEpochs: Double = Pipeline.EpochMaxEpochs): DataFrame = {
    val per = docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val z = per.agg(
      aggregate(sort_array(collect_list(
          sqrt(col("n_tokens").cast("double")))),
        lit(0.0), (a, x) => a + x).as("z"),
      sum(col("n_tokens")).as("total_tokens"))
    val epochsRaw = col("target_tokens") / col("n_tokens").cast("double")
    per.crossJoin(broadcast(z))
      .withColumn("weight",
        sqrt(col("n_tokens").cast("double")) / col("z"))
      .withColumn("target_tokens",
        lit(budgetMult) * col("total_tokens").cast("double") * col("weight"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"),
        least(epochsRaw, lit(maxEpochs)).as("epochs"),
        (least(epochsRaw, lit(maxEpochs)) * col("n_tokens").cast("double"))
          .as("tokens_served"),
        (epochsRaw > lit(maxEpochs)).as("capped"))
  }

  /** the curation FUNNEL — the observability rollup every pipeline run
    * reports: how many documents each gate dropped, with the gates
    * composed SEQUENTIALLY in their production order (quality → near-dup
    * keep → eval exclusion+decontamination → domain cap), so stage k's
    * `n_in` is stage k−1's `n_out` and the numbers read as the actual
    * attrition curve, not four independent audits. Each gate's pass set
    * is the EXISTING operator's verdict column (x26 keep, x16 min-id
    * representative, x36 not-contaminated over the non-eval slice, x35
    * kept) — the funnel adds four doc_id equi-joins of boolean flags
    * and ONE aggregation row exploded into the 4 stage rows; nothing
    * here re-derives a gate.
    */
  def curationFunnel(docs: DataFrame, evalMod: Long = 10L): DataFrame = {
    val q = TextOps.qualityGate(docs)
      .select(col("doc_id"), col("keep").as("p1"))
    val d = Dedup.dupClusterLabels(docs)
      .select(col("doc_id"),
        (col("doc_id") === col("cluster_id")).as("p2"))
    // eval docs have no decontam row (they ARE the eval set): the left
    // join's null coalesces to false — excluded at this stage
    val c = Dedup.fuzzyDecontam(docs, evalMod)
      .select(col("doc_id"), (!col("contaminated")).as("pc"))
    val cap = Sampling.domainCap(docs)
      .select(col("doc_id"), col("kept").as("p4"))
    val flags = docs.select(col("doc_id"))
      .join(q, Seq("doc_id"))
      .join(d, Seq("doc_id"))
      .join(c, Seq("doc_id"), "left")
      .join(cap, Seq("doc_id"))
      .select(col("p1"), col("p2"),
        coalesce(col("pc"), lit(false)).as("p3"), col("p4"))
    def surv(ps: Column*): Column =
      sum(when(ps.reduce(_ && _), 1L).otherwise(0L))
    val agg = flags.agg(count(lit(1)).as("n0"),
      surv(col("p1")).as("n1"),
      surv(col("p1"), col("p2")).as("n2"),
      surv(col("p1"), col("p2"), col("p3")).as("n3"),
      surv(col("p1"), col("p2"), col("p3"), col("p4")).as("n4"))
    def stageRow(id: Long, name: String, nIn: Column, nOut: Column) =
      struct(lit(id).as("stage_id"), lit(name).as("stage"),
        nIn.as("n_in"), nOut.as("n_out"))
    agg.select(explode(array(
        stageRow(1L, "quality_gate", col("n0"), col("n1")),
        stageRow(2L, "near_dedup", col("n1"), col("n2")),
        stageRow(3L, "eval_decontam", col("n2"), col("n3")),
        stageRow(4L, "domain_cap", col("n3"), col("n4")))).as("s"))
      .select(col("s.stage_id").as("stage_id"), col("s.stage").as("stage"),
        col("s.n_in").as("n_in"), col("s.n_out").as("n_out"),
        (col("s.n_in") - col("s.n_out")).as("n_dropped"))
  }
}
