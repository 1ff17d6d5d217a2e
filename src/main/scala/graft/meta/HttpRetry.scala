package graft.meta

/** One bounded retry on a 5xx or a connection-level IOException —
  * transport robustness shared by BOTH live catalog clients (r17
  * review: the REST and Glue copies had already diverged in shape, and
  * a future retry-policy change must not have to land twice). The
  * attempt thunk REBUILDS the request each call, so a signing client
  * re-signs with a fresh timestamp on retry.
  */
private[meta] object HttpRetry {

  def sendTwice(what: String,
      attempt: () => (Int, String)): (Int, String) = {
    def once(): Either[Throwable, (Int, String)] =
      try Right(attempt())
      catch { case e: java.io.IOException => Left(e) }
    val result = once() match {
      case Right((code, _)) if code >= 500 => once()
      case Left(_) => once()
      case ok => ok
    }
    result match {
      case Right(r) => r
      case Left(e) => throw new RuntimeException(
        s"$what: connection failed twice: ${e.getMessage}", e)
    }
  }
}
