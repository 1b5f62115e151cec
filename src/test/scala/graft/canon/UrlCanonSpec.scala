package graft.canon

import org.scalatest.funsuite.AnyFunSuite

/** Canonicalization corpus ported verbatim from the reference
  * (reference: linkresult/src/uri_service.rs:157-233). */
class UrlCanonSpec extends AnyFunSuite {

  test("form_full_url returns correct uri (reference corpus)") {
    val host = "example.com"
    val cases = Seq(
      ("/", "https://example.com/"),
      ("/account/login?redirect=https://example.com/", "https://example.com/account/login?redirect=https%3A%2F%2Fexample.com%2F"),
      ("/agb/", "https://example.com/agb/"),
      ("/ausgabe/example-com-62-mindful-leadership/", "https://example.com/ausgabe/example-com-62-mindful-leadership/"),
      ("#", "https://example.com/#"),
      ("#s-angle-down", "https://example.com/#s-angle-down"),
      ("/#foo", "https://example.com/#foo"),
      ("example.com", "https://example.com/"),
      ("https://example.com/", "https://example.com/"),
      ("http://example.com/http-downgrade", "http://example.com/http-downgrade"),
      ("https://example.com/ausgabe/example-com-59-straight-outta-office/", "https://example.com/ausgabe/example-com-59-straight-outta-office/"),
      ("https://example.com/events/", "https://example.com/events/"),
      ("https://faq.example.com/", "https://faq.example.com/"),
      ("https://twitter.com/example-com", "https://twitter.com/example-com"),
      ("mailto:support@example.com", "mailto:support@example.com"),
      ("//storage.googleapis.com/example.com/assets/foo.png", "https://storage.googleapis.com/example.com/assets/foo.png"),
      ("/some invalid url/assets/my picture.png", "https://example.com/some%20invalid%20url/assets/my%20picture.png"),
    )
    cases.foreach { case (uri, expected) =>
      assert(UrlCanon.formFullUrl("https", uri, host, Some("")) == expected, s"form_full_url('$uri')")
    }
  }

  test("use protocol from full url") {
    val host = "example.com"
    val cases = Seq(
      ("http", "https://example.com", "https://example.com/"),
      ("https", "https://example.com", "https://example.com/"),
      ("https", "http://example.com", "http://example.com/"),
      ("http", "http://example.com", "http://example.com/"),
    )
    cases.foreach { case (proto, uri, expected) =>
      assert(UrlCanon.formFullUrl(proto, uri, host, Some("")) == expected)
    }
  }

  test("clean and normalize url (../ resolution, // collapsing)") {
    val host = "www.example.com"
    val cases = Seq(
      ("https://www.example.com/", "/foo/", "https://www.example.com/foo/"),
      ("https://www.example.com", "/foo/", "https://www.example.com/foo/"),
      ("https://www.example.com/", "//foo//", "https://foo/"),
      ("https://www.example.com/", "///////foo//////", "https://foo/"),
      ("https://www.example.com/", "http-headers-explained/", "https://www.example.com/http-headers-explained/"),
      ("https://www.example.com/about/appsecurity/tools/", "../../../about/appsecurity/research/presentations/", "https://www.example.com/about/appsecurity/research/presentations/"),
      ("https://www.example.com/about/appsecurity/tools", "../../../about/appsecurity/research/presentations/", "https://www.example.com/about/appsecurity/research/presentations/"),
    )
    cases.foreach { case (parent, uri, expected) =>
      assert(UrlCanon.formFullUrl("https", uri, host, Some(parent)) == expected, s"'$uri' against '$parent'")
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
