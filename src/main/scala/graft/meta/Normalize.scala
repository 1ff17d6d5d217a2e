package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar derivations over the raw metadata model (SURVEY §2.2, P1-P14).
  *
  * All of these are pure column expressions (codegen'd, no UDFs); they are
  * applied once at ingest ([[Normalize.snapshots]]) so every downstream
  * operator reads typed columns instead of re-parsing the stringly summary
  * map at each use site the way the reference does
  * (`/root/reference/src/analytics.rs:75,79,219`).
  */
object Normalize {

  /** value of a summary-map key; null when the map is null or key absent
    * (map values are never null in the Iceberg summary model)
    */
  def sv(k: String): Column = element_at(col("summary"), k)

  /** P7 — operation inference (`iceberg_adapter.rs:169-187`): explicit
    * `operation` key, else `spark.app.id` ⇒ append, else `added-*` ⇒
    * append / `deleted-*` ⇒ delete / `total-data-files` ⇒ overwrite,
    * default append; P2 — null summary ⇒ "unknown" (`data.rs:156-161`).
    */
  def operation: Column =
    when(col("summary").isNull, lit("unknown"))
      .otherwise(coalesce(
        sv("operation"),
        when(sv("spark.app.id").isNotNull, "append"),
        when(sv("added-data-files").isNotNull || sv("added-records").isNotNull,
          "append"),
        when(sv("deleted-data-files").isNotNull ||
          sv("deleted-records").isNotNull, "delete"),
        when(sv("total-data-files").isNotNull, "overwrite"),
        lit("append")))

  /** P9 with Rust `parse::<u64>` fidelity: only all-digit strings parse
    * (Spark's string→long cast accepts "12.5" etc., which the reference's
    * integer parse rejects — and rejected values must PASS range filters,
    * SURVEY §7.5.2). Null when unparseable/absent.
    */
  def asU64(c: Column): Column = when(c.rlike("^\\d+$"), c.cast("long"))

  /** P9 for f64 fields (`parse::<f64>` accepts decimals): plain cast,
    * null on junk.
    */
  def asF64(c: Column): Column = c.cast("double")

  /** P3 — records_added with "0" default (`data.rs:163-168`). */
  def recordsAdded: Column = coalesce(sv("added-records"), lit("0"))

  /** P4 — size_change rendering (`data.rs:170-184`). */
  def sizeChange: Column = {
    val a = sv("added-files-size"); val r = sv("removed-files-size")
    when(a.isNotNull && r.isNotNull, concat(lit("+"), a, lit(" -"), r))
      .when(a.isNotNull, concat(lit("+"), a))
      .otherwise(lit("N/A"))
  }

  /** P13 — `"{namespace}.{table}"` (`catalog.rs:344`). */
  def fullName(ns: Column, name: Column): Column = concat_ws(".", ns, name)

  /** P14 — credential masking for display (`config.rs:107-124`):
    * auth_token becomes ***HIDDEN*** unless empty; r18 extends the
    * same rule to the OAuth2 `credential` key (client secret), which
    * the r18 token flow introduces to the registry vocabulary.
    */
  def maskSecret(key: Column, value: Column): Column =
    when(key.isin("auth_token", "credential") && value =!= "",
      lit("***HIDDEN***")).otherwise(value)

  /** The normalized snapshot projection (S7): typed columns derived once.
    * P1 ms→timestamp is deterministic (no wall-clock overflow fallback —
    * the reference's `unwrap_or_else(Utc::now)` at `data.rs:153` is a
    * nondeterminism bug we do not reproduce).
    */
  def snapshots(raw: DataFrame): DataFrame =
    raw.select(
      col("catalog"), col("namespace"), col("name"),
      col("snapshot_id"), col("ts_ms"),
      timestamp_millis(col("ts_ms")).as("ts"),
      col("manifest_list"), col("schema_id"),
      col("summary"),
      col("summary").isNotNull.as("has_summary"),
      operation.as("op"),
      recordsAdded.as("records_added"),
      sizeChange.as("size_change"),
      asU64(sv("added-data-files")).as("added_files"),
      asU64(sv("deleted-data-files")).as("deleted_files"),
      asU64(sv("added-records")).as("added_records"),
      asU64(sv("deleted-records")).as("deleted_records"),
      asU64(sv("total-records")).as("total_records"),
      asF64(sv("total-size")).as("total_size_bytes"),
      sv("total-size").isNotNull.as("has_total_size"))
}
