package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end pipeline compositions — the "final SELECT" a training-data
  * run executes after the individual ops: which documents survive every
  * gate, and what the resulting mixture looks like per (source, split).
  */
object Pipeline {

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
}
