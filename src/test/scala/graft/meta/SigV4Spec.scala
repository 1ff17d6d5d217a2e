package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** [[SigV4]] unit coverage beyond the live round-trip
  * (GlueHttpCatalogSpec verifies full signatures against an
  * independent recomputation): header shape, determinism, the
  * credential-scope fields, URI encoding rules, session-token
  * inclusion.
  */
class SigV4Spec extends AnyFunSuite {

  private val creds = SigV4.Credentials("AKID", "sekrit")
  private val date = "20260816T120000Z"

  private def sign(payload: String = "{}",
      c: SigV4.Credentials = creds): Map[String, String] =
    SigV4.sign("POST", "/", Seq.empty,
      Map("host" -> "glue.us-east-1.amazonaws.com",
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "AWSGlue.GetDatabases"),
      payload.getBytes("UTF-8"), c, "us-east-1", "glue", date)

  test("authorization header carries scope, sorted signed headers, hex sig") {
    val h = sign()
    val auth = h("Authorization")
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKID/20260816/" +
      "us-east-1/glue/aws4_request, SignedHeaders="))
    val signed = "SignedHeaders=([^,]+)".r
      .findFirstMatchIn(auth).get.group(1).split(";").toSeq
    assert(signed == signed.sorted)
    assert(signed.contains("host") && signed.contains("x-amz-target") &&
      signed.contains("x-amz-date") &&
      signed.contains("x-amz-content-sha256"))
    assert("Signature=([0-9a-f]{64})$".r.findFirstIn(auth).isDefined)
    assert(h("x-amz-date") == date)
  }

  test("signing is deterministic; any input change moves the signature") {
    def sig(h: Map[String, String]): String =
      "Signature=([0-9a-f]+)".r.findFirstMatchIn(h("Authorization"))
        .get.group(1)
    assert(sig(sign()) == sig(sign()))
    assert(sig(sign()) != sig(sign(payload = """{"DatabaseName":"x"}""")))
    assert(sig(sign()) != sig(sign(c = SigV4.Credentials("AKID", "other"))))
  }

  test("payload hash header is the SHA-256 of the body") {
    val h = sign(payload = "")
    // SHA-256 of the empty string — the one universally published
    // constant every SigV4 implementation must reproduce
    assert(h("x-amz-content-sha256") ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("session token is signed in when present") {
    val h = sign(c = SigV4.Credentials("AKID", "sekrit", Some("tok")))
    assert(h("x-amz-security-token") == "tok")
    assert(h("Authorization").contains("x-amz-security-token"))
  }

  test("uri encoding: unreserved kept, others uppercase-percent, path slashes kept") {
    assert(SigV4.uriEncode("AZaz09-_.~") == "AZaz09-_.~")
    assert(SigV4.uriEncode("a b+c/d") == "a%20b%2Bc%2Fd")
    assert(SigV4.uriEncodePath("/bucket/key with space/v1.json") ==
      "/bucket/key%20with%20space/v1.json")
    // multi-byte UTF-8 percent-encodes per byte
    assert(SigV4.uriEncode("é") == "%C3%A9")
  }
}
