package graft.canon

import org.scalatest.funsuite.AnyFunSuite

/** Canonicalization corpus ported verbatim from the reference
  * (reference: linkresult/src/uri_service.rs:157-233). */
class UrlCanonSpec extends AnyFunSuite {

  test("form_full_url returns correct uri (reference corpus, all three blocks)") {
    assert(ReferenceCorpus.canonCases.size >= 28, "full corpus expected")
    ReferenceCorpus.canonCases.foreach { case (proto, uri, host, parent, want) =>
      assert(UrlCanon.formFullUrl(proto, uri, host, Some(parent)) == want,
        s"form_full_url('$proto', '$uri', '$host', '$parent')")
    }
  }

  test("urlEncode matches the Rust urlencoding crate charset") {
    assert(UrlCanon.urlEncode("https://a.com/b c") == "https%3A%2F%2Fa.com%2Fb%20c")
    assert(UrlCanon.urlEncode("A-z0.9_~") == "A-z0.9_~")
    assert(UrlCanon.urlEncode("ä") == "%C3%A4") // UTF-8 bytes
  }

  test("host and protocol extraction") {
    assert(UrlCanon.hostOf("https://example.com/a/b?c") == Some("example.com"))
    assert(UrlCanon.hostOf("http://sub.host.de:8080/x") == Some("sub.host.de"))
    assert(UrlCanon.hostOf("mailto:foo@bar") == None)
    assert(UrlCanon.protocolOf("https://example.com/") == Some("https"))
    assert(UrlCanon.protocolOf("/relative") == None)
  }
}
