package graft.meta

/** Iceberg-metadata domain model (SURVEY.md §1.1), normalized from the
  * reference's denormalized `IcebergTable` root object
  * (`/root/reference/src/data.rs:5-18`) into per-entity Datasets keyed by
  * (catalog, namespace, name) — the layout that scales: each entity is an
  * independently partitionable fact/dimension table rather than a nested
  * vector inside one driver-side struct.
  *
  * The snapshot `summary` stays a raw string→string map at rest (Iceberg
  * stores summary properties stringly — `src/iceberg_adapter.rs:158-202`);
  * [[Normalize]] projects + casts it exactly once at ingest (SURVEY §1.1
  * "parse once, eagerly", vs the reference's parse-at-every-use).
  */
object Model {

  /** `src/data.rs:88-95` — the fact table of the whole domain. */
  case class SnapshotFx(
      catalog: String,
      namespace: String,
      name: String,
      snapshot_id: Long,
      ts_ms: Long,
      manifest_list: String,
      schema_id: Option[Int],
      summary: Option[Map[String, String]])

  /** `src/data.rs:26-33` — field_type kept in rendered form
    * (`src/data.rs:65-86`), e.g. "decimal(10, 2)", "struct<...>".
    */
  case class FieldFx(
      id: Int,
      name: String,
      required: Boolean,
      doc: Option[String],
      ftype: String)

  /** `src/data.rs:20-24`; is_current mirrors `table.schema.schema_id`. */
  case class SchemaFx(
      catalog: String,
      namespace: String,
      name: String,
      schema_id: Int,
      is_current: Boolean,
      fields: Seq[FieldFx])

  /** `src/data.rs:110-122`; transform rendered per `src/data.rs:136-149`:
    * identity | bucket[n] | truncate[w] | year | month | day | hour | void.
    */
  case class PartFieldFx(
      source_id: Int,
      field_id: Int,
      name: String,
      transform: String)

  case class SpecFx(
      catalog: String,
      namespace: String,
      name: String,
      spec_id: Int,
      is_default: Boolean,
      fields: Seq[PartFieldFx])

  /** `src/catalog.rs:19-44` — one row per (catalog, namespace, table) from
    * the S4/S5 listing fan-out; table_type = iceberg | unknown
    * (classification probe, `src/catalog.rs:342-375`). full_name is NOT
    * stored — it is the P13 derivation `concat_ws(".", ns, name)`
    * (`src/catalog.rs:344`).
    */
  case class ListingFx(
      catalog_name: String,
      catalog_type: String,
      namespace: String,
      table_name: String,
      table_type: String)

  /** `src/data.rs:5-18` head object minus the child vectors. */
  case class TableMetaFx(
      catalog: String,
      namespace: String,
      name: String,
      location: String,
      current_snapshot_id: Option[Long],
      current_schema_id: Int,
      properties: Map[String, String])

  /** `src/catalog.rs:19-24` / `src/config.rs:10-13`. */
  case class ConfigFx(
      name: String,
      catalog_type: String,
      config: Map[String, String])

  /** Pinned `asOf` for every analytics computation — the reference calls
    * `Utc::now()` inside analytics (`src/analytics.rs:129,261,356`), which
    * is nondeterministic; the engine makes the clock an explicit parameter
    * (SURVEY §7.5.1). 2025-06-01T00:00:00Z.
    */
  val AsOfMs: Long = 1748736000000L
}
