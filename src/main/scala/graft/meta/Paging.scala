package graft.meta

/** Listing pagination shared by the catalog clients (r16 verdict task
  * 1): both live transports page — AWS Glue caps GetDatabases/GetTables
  * at 100 entries and continues via `NextToken`; the Iceberg REST spec
  * continues via `pageToken`/`next-page-token` — and the reference gets
  * complete listings because its SDKs iterate to exhaustion
  * (`/root/reference/src/catalog.rs:261-286,313-340`). A client that
  * reads one page silently truncates the catalog: tables vanish from
  * listings and snapshots with no error, the worst failure mode.
  *
  * Driver-side by design: catalog listings are KB-sized control-plane
  * metadata (same rationale as the parse layer — see [[RestWire]]).
  */
private[meta] object Paging {

  /** stop a server that never terminates (e.g. echoes a constant
    * token) from hanging the client forever; at Glue's 100-entry page
    * size this still admits a million-table namespace
    */
  val MaxPages = 10000

  /** accumulate `parse`d pages until `nextOf` yields no continuation.
    *
    * @param fetch  one transport read; `None` on the FIRST page means
    *               the whole listing is absent (the not-found probe —
    *               empty result, like the unpaged clients). `None` on a
    *               continuation page is a protocol violation (the
    *               server issued the token) and fails fast rather than
    *               returning the truncated prefix this helper exists to
    *               prevent.
    * @param nextOf the response's continuation token, `None` when done
    */
  def collect[T](what: String, fetch: Option[String] => Option[String],
      parse: String => Seq[T], nextOf: String => Option[String]): Seq[T] = {
    val out = Seq.newBuilder[T]
    var token: Option[String] = None
    var pages = 0
    var done = false
    while (!done) {
      fetch(token) match {
        case None if pages == 0 => return Seq.empty
        case None => sys.error(
          s"$what: server issued continuation token ${token.get} " +
            "but the continuation page is missing")
        case Some(body) =>
          out ++= parse(body)
          val next = nextOf(body)
          if (next.isDefined && next == token) sys.error(
            s"$what: server repeated continuation token ${token.get}")
          token = next
          done = token.isEmpty
      }
      pages += 1
      if (pages > MaxPages) sys.error(
        s"$what: listing exceeded $MaxPages pages — refusing to loop")
    }
    out.result()
  }
}
