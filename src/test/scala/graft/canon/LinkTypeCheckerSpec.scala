package graft.canon

import org.scalatest.funsuite.AnyFunSuite

/** Scope + protocol corpora ported verbatim from the reference tests
  * (reference: linkresult/src/link_type_checker.rs:101-163, :207-256).
  * The corpus DATA lives in [[ReferenceCorpus]] so the driver-facing
  * `q_canon_corpus` query evaluates the identical cases. */
class LinkTypeCheckerSpec extends AnyFunSuite {

  private val checker = LinkTypeChecker.forHost(ReferenceCorpus.host)

  test("get_uri_scope returns correct type (reference corpus incl. share urls)") {
    assert(ReferenceCorpus.scopeCases.size >= 43, "full corpus expected")
    ReferenceCorpus.scopeCases.foreach { case (uri, expected) =>
      assert(checker.getUriScope(uri) == expected, s"scope of '$uri'")
    }
  }

  test("get_uri_protocol returns correct protocol (reference corpus)") {
    assert(ReferenceCorpus.protocolCases.size >= 29, "full corpus expected")
    ReferenceCorpus.protocolCases.foreach { case (parent, uri, expected) =>
      assert(checker.getUriProtocol(parent, uri) == expected,
        s"protocol of ('$parent', '$uri')")
    }
  }

  test("builder-authored extra goldens: uppercase scheme, unknown prefixes, file-parent relatives") {
    import ReferenceCorpus.{extraHost, extraParent, extraCases}
    val ck = LinkTypeChecker.forHost(extraHost)
    extraCases.foreach { case (uri, canon, scope, proto) =>
      assert(UrlCanon.formFullUrl("https", uri, extraHost, Some(extraParent)) == canon, s"canon '$uri'")
      assert(ck.getUriScope(uri) == Option(scope), s"scope '$uri'")
      assert(ck.getUriProtocol("https", uri) == Option(proto), s"protocol '$uri'")
    }
  }
}
