package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.meta.Normalize

/** T7 — incremental per-table health aggregates with explicit state
  * (SURVEY §2.10): the one operator where custom streaming state is
  * warranted. Each table key holds a running [[IncrementalHealth.TableState]]
  * (snapshot count, per-class op counts, latest timestamp) updated by
  * `flatMapGroupsWithState`; every micro-batch emits the refreshed row, so
  * downstream dashboards see health metrics advance without rescanning
  * history — the streaming upgrade of the batch [[graft.analytics.Health]]
  * pass.
  *
  * State is keyed by (catalog, namespace, name) — it scales with live
  * TABLE COUNT, not snapshot volume, and the state schema is versioned
  * (v1) so checkpoints survive upgrades (SURVEY §7.5.7).
  */
object IncrementalHealth {

  /** versioned state record (v1) */
  case class TableState(
      version: Int, n_snapshots: Long, n_append: Long, n_delete: Long,
      n_overwrite: Long, n_compaction: Long, max_ts_ms: Long)

  case class SnapEvent(
      catalog: String, namespace: String, name: String, op: String,
      ts_ms: Long)

  case class TableUpdate(
      catalog: String, namespace: String, name: String, n_snapshots: Long,
      n_append: Long, n_delete: Long, n_overwrite: Long, n_compaction: Long,
      max_ts_ms: Long)

  private def update(
      key: (String, String, String), events: Iterator[SnapEvent],
      state: GroupState[TableState]): Iterator[TableUpdate] = {
    var s = state.getOption.getOrElse(TableState(1, 0, 0, 0, 0, 0, 0L))
    events.foreach { e =>
      s = s.copy(
        n_snapshots = s.n_snapshots + 1,
        n_append = s.n_append + (if (e.op == "append") 1 else 0),
        n_delete = s.n_delete + (if (e.op == "delete") 1 else 0),
        n_overwrite = s.n_overwrite + (if (e.op == "overwrite") 1 else 0),
        n_compaction = s.n_compaction +
          (if (e.op.contains("rewrite") || e.op.contains("compact")) 1 else 0),
        max_ts_ms = math.max(s.max_ts_ms, e.ts_ms))
    }
    state.update(s)
    Iterator.single(TableUpdate(key._1, key._2, key._3, s.n_snapshots,
      s.n_append, s.n_delete, s.n_overwrite, s.n_compaction, s.max_ts_ms))
  }

  /** stream the snapshot fixture as arriving metadata events and fold
    * them through the stateful operator; with `Trigger.AvailableNow` the
    * final emission per table equals the batch aggregation (the oracle).
    */
  def run(spark: SparkSession, fixtureDir: String): DataFrame = {
    import spark.implicits._
    // the fixture is a parquet DIRECTORY, so the file source monitors it
    // directly (new snapshot files landing there would stream in)
    val path = s"$fixtureDir/snapshots.parquet"
    val schema = spark.read.parquet(path).schema
    val events = Normalize.snapshots(
        spark.readStream.schema(schema).parquet(path))
      .select($"catalog", $"namespace", $"name", $"op", $"ts_ms")
      .as[SnapEvent]
    val updated = events
      .groupByKey(e => (e.catalog, e.namespace, e.name))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
    val q = updated.toDF().writeStream.format("memory")
      .queryName("st_incr_health").outputMode("update")
      .option("checkpointLocation", StreamOps.checkpointDir("incr_health"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one batch → at most one emission per table; later batches would
    // supersede earlier rows by key (take the max-count row per key)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"catalog", $"namespace", $"name")
      .orderBy($"n_snapshots".desc)
    spark.table("st_incr_health")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }
}
