package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** [[Paging.collect]] edge cases the live-server specs can't easily
  * stage: the protocol-violation fail-fasts exist precisely so a
  * misbehaving server can never cause the silent-truncation failure
  * mode pagination was built to prevent.
  */
class PagingSpec extends AnyFunSuite {

  // a tiny in-memory "server": token -> (payload items, next token)
  private def fetcher(pages: Map[Option[String], (Seq[String], Option[String])])
      : Option[String] => Option[String] =
    tok => pages.get(tok).map { case (items, next) =>
      items.mkString(",") + "|" + next.getOrElse("")
    }
  private def parse(body: String): Seq[String] = {
    val items = body.split("\\|", -1)(0)
    if (items.isEmpty) Seq.empty else items.split(",").toSeq
  }
  private def nextOf(body: String): Option[String] =
    Some(body.split("\\|", -1)(1)).filter(_.nonEmpty)

  test("single page, multi page, and empty-but-continuing middle page") {
    assert(Paging.collect("t", fetcher(Map(
      None -> (Seq("a", "b"), None))), parse, nextOf) == Seq("a", "b"))
    assert(Paging.collect("t", fetcher(Map(
      None -> (Seq("a"), Some("p1")),
      Some("p1") -> (Seq.empty[String], Some("p2")),
      Some("p2") -> (Seq("b"), None))), parse, nextOf) == Seq("a", "b"))
  }

  test("an absent FIRST page is the not-found probe: empty, no error") {
    assert(Paging.collect("t", _ => None, parse, nextOf) == Seq.empty)
  }

  test("a missing CONTINUATION page fails fast, never truncates") {
    val e = intercept[RuntimeException] {
      Paging.collect("t", fetcher(Map(
        None -> (Seq("a"), Some("p1")))), parse, nextOf)
    }
    assert(e.getMessage.contains("continuation page is missing"))
  }

  test("a server echoing the same token forever fails fast") {
    val e = intercept[RuntimeException] {
      Paging.collect("t", fetcher(Map(
        None -> (Seq("a"), Some("p1")),
        Some("p1") -> (Seq("b"), Some("p1")))), parse, nextOf)
    }
    assert(e.getMessage.contains("repeated continuation token"))
  }

  test("a token cycle that never repeats consecutively trips the page cap") {
    // p1 -> p2 -> p1 -> p2 ... : the repeated-token check (consecutive
    // only) can't see it; the MaxPages bound must
    val e = intercept[RuntimeException] {
      Paging.collect("t", fetcher(Map(
        None -> (Seq("a"), Some("p1")),
        Some("p1") -> (Seq("b"), Some("p2")),
        Some("p2") -> (Seq("c"), Some("p1")))), parse, nextOf)
    }
    assert(e.getMessage.contains("refusing to loop"))
  }
}
