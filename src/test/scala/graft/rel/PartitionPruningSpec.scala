package graft.rel

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-pruning demo (SURVEY §4 lists it N/A for the unpartitioned
  * fixtures): data laid out with `partitionBy` must yield scans whose
  * partition filters eliminate directories BEFORE reading — the layout
  * decision that turns a 100 TB full scan into a single-partition read.
  */
class PartitionPruningSpec extends SparkSpec {

  test("year-partitioned layout prunes non-matching partitions at scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)

    val pruned = spark.read.parquet(out).filter(col("o_year") === 1996)
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    // the partition filter is applied at listing time: the scan carries
    // it as a partitionFilter (not a post-scan data filter), and the
    // formatted plan reports the pruned selection
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "o_year")),
      s"expected a partition filter on o_year, got ${scan.partitionFilters}")
    val yearsOnDisk = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("o_year="))
    assert(yearsOnDisk > 1, "fixture spans multiple years")
    // correctness unchanged
    val expected = orders.filter(col("o_year") === 1996).count()
    assert(pruned.count() == expected && expected > 0)
  }
}
