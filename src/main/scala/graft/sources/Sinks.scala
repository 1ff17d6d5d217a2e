package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side layout operators (SURVEY §2.1 S10 extended for the 100 TB
  * pipeline): HOW results land on storage decides what every downstream
  * read costs.
  *
  *   - [[writePartitioned]]: hive-style directory partitioning — a later
  *     scan with a predicate on the partition column prunes whole
  *     directories before any file is opened (`PartitionFilters` in the
  *     plan, zero I/O for pruned values). The right layout for
  *     low-cardinality routing keys (lang, date, split).
  *   - [[writeBucketed]]: bucketed + sorted managed table — rows are
  *     hash-distributed into a fixed bucket count on the join/agg key at
  *     WRITE time, so later joins and aggregations on that key run with
  *     NO exchange on the bucketed side (the spec asserts the
  *     bucketed-join plan is exchange-free). The right layout for the
  *     high-cardinality keys a pipeline joins repeatedly (doc_id,
  *     vec_id): one shuffle at write time amortizes every future read.
  *
  * Both are thin, deliberately: the value is the layout contract, not
  * wrapper code.
  */
object Sinks {

  /** directory-partitioned parquet at `path`; `maxRecordsPerFile` guards
    * against the many-small-files failure mode when a partition value is
    * hot (the skew knob a 100 TB write needs)
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** bucketed (and bucket-sorted) managed parquet table `table` —
    * bucketBy requires the table catalog, so this lands in the session's
    * warehouse; a deployment points `spark.sql.warehouse.dir` (or an
    * external catalog) at real storage
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
