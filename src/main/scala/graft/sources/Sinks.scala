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

  /** z-ordered parquet at `path`: rows are range-partitioned and sorted
    * by the 62-bit Morton code of the two (normalized int/long) cluster
    * columns — the Iceberg `rewrite_data_files` zorder strategy
    * re-expressed as a plain Spark write. Each output file then covers a
    * compact z-range, so its per-file min/max stats stay tight on BOTH
    * columns and a later scan filtering on EITHER prunes most files
    * (ZOrderSinkSpec asserts the two-sided pruning contract).
    *
    * `repartitionByRange` samples the code distribution, so file
    * boundaries adapt to skew; one range shuffle at write time is the
    * whole cost, amortized over every future scan — the
    * [[writeBucketed]] trade for range predicates instead of equi-joins.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.{call_function, col}
    df.withColumn("zval", call_function("zorder2", col(colA), col(colB)))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
