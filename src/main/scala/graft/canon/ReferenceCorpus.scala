package graft.canon

/** The reference's full URL-classification and canonicalization corpora,
  * ported verbatim as DATA (the compatibility contract) so both the specs
  * and the driver-facing `q_canon_corpus` query evaluate the identical
  * cases.
  *
  * Sources (in /root/reference):
  *  - scope cases: linkresult/src/link_type_checker.rs:101-163 (incl. the
  *    twitter/linkedin/xing share-url block, :150-156)
  *  - protocol cases: linkresult/src/link_type_checker.rs:207-256
  *  - canonicalization cases: linkresult/src/uri_service.rs:157-233
  */
object ReferenceCorpus {
  import UriScope._
  import UriProtocol._

  /** The host every scope/protocol case classifies against. */
  val host = "example.com"

  private val dataUri = "data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAAAAAA6fptVAAAACklEQVR4nGP6AgAA+gD3odZZSQAAAABJRU5ErkJggg=="

  /** (uri, expected scope) — get_uri_scope over `host`. */
  val scopeCases: Seq[(String, Option[String])] = Seq(
    "/" -> Some(Root),
    "example.com" -> Some(Root),
    "example.com/" -> Some(Root),
    "http://example.com" -> Some(Root),
    "http://example.com/" -> Some(Root),
    "https://example.com" -> Some(Root),
    "https://example.com/" -> Some(Root),
    "#" -> Some(Anchor),
    "#s-angle-down" -> Some(Anchor),
    "/#s-angle-down" -> Some(Anchor),
    dataUri -> Some(EmbeddedImage),
    "/account/login?redirect=https://example.com/" -> Some(SameDomain),
    "/agb/" -> Some(SameDomain),
    "/ausgabe/example-com-62-mindful-leadership/" -> Some(SameDomain),
    "//cdn.external-domain.com/example.com/some-big-file.RAW" -> Some(External),
    "//storage.googleapis.com/example.com/foo.png" -> Some(External),
    "//foo.example.com/some-file.png" -> Some(DifferentSubDomain),
    "somefile/some.txt" -> Some(SameDomain),
    "http://feeds.soundcloud.com/users/soundcloud:users:213461595/sounds.rss" -> Some(External),
    "https://example-com.cloudfront.net/example-com/images/icons/example-com-apple-touch-120x120.png" -> Some(External),
    "https://faq.example.com/" -> Some(DifferentSubDomain),
    "https://faq.example.com/deep-link?https://example.com" -> Some(DifferentSubDomain),
    "https://www.somewhere.com?source=https%3A%2F%2F//faq.example.com/" -> Some(External),
    "https://www.somewhere.com/?source=https://faq.example.com/" -> Some(External),
    "https://www.somewhere.com?https://faq.example.com/" -> Some(External),
    "https://getpocket.com/edit.php?url=https%3A%2F%2Fexample.com%2Fnews%2Fchangerider-karriereknick-fuer-1351665%2F%3Futm_source%3Dpocket%26utm_medium%3Dsocial%26utm_campaign%3Dsocial-buttons" -> Some(External),
    "https://medium.com/@example-combackstageblog" -> Some(External),
    "https://example.com/ausgabe/example-com-59-straight-outta-office/" -> Some(SameDomain),
    "https://example.com/rss.xml" -> Some(SameDomain),
    "https://example.com/team" -> Some(SameDomain),
    "https://www.kununu.com/de/example-com/" -> Some(External),
    "mailto:support@example.com" -> Some(Mailto),
    "https://example-com.cloudfront.net/example-com/styles/main-1234567890.css" -> Some(External),
    "https://www.a-b-c.com" -> Some(External),
    "javascript:fef4ee" -> Some(Code),
    "java:nothing" -> Some(UnknownPrefix),
    "customPrefix:nothing" -> Some(UnknownPrefix),
    "customPrefXix:foobar();" -> Some(UnknownPrefix),
    "" -> None,
    // share-url block (link_type_checker.rs:150-156; BOTH twitter intent
    // cases — :137 and :138 — so the port is literally complete)
    "https://twitter.com/intent/tweet?text=Googles%20Mobile-First-Indexing%3A%20Das%20sollten%20SEO-Experten%20unbedingt%20beachten&url=https%3A%2F%2Fexample.com%2Fmagazin%2Fgoogles-mobile-first-indexing-250229%2F%3Futm_source%3Dtwitter.com%26utm_medium%3Dsocial%26utm_campaign%3Dsocial-buttons&via=example-com&lang=de" -> Some(External),
    "https://twitter.com/intent/tweet?text=Segway-Ninebot%3A%20Den%20neuen%20E-Scooter%20Ninebot%20S%20Max%20kannst%20du%20zum%20Gokart%20machen&url=https%3A%2F%2Fexample.com%2Fnews%2Fsegway-ninebot-s-max-gokart-1351854%2F%3Futm_source%3Dtwitter.com%26utm_medium%3Dsocial%26utm_campaign%3Dsocial-buttons&via=example-com&lang=de" -> Some(External),
    "https://www.linkedin.com/shareArticle?mini=true&url=https%3A%2F%2Fexample.com%2Fnews%2Feu-leistungsschutzrecht-frankreich-publisher-google-news-1351802%2F%3Futm_source%3Dlinkedin.com%26utm_medium%3Dsocial%26utm_campaign%3Dsocial-buttons" -> Some(External),
    "https://www.xing.com/spi/shares/new?url=https%3A%2F%2Fexample.com%2Fmagazin%2Fgoogles-mobile-first-indexing-250229%2F%3Futm_source%3Dxing.com%26utm_medium%3Dsocial%26utm_campaign%3Dsocial-buttons" -> Some(External),
  )

  /** (parent protocol, uri, expected protocol) — get_uri_protocol. */
  val protocolCases: Seq[(String, String, Option[String])] = Seq(
    ("http", "/", Some(HTTP)),
    ("https", "/", Some(HTTPS)),
    ("http", "#", Some(HTTP)),
    ("https", "#", Some(HTTPS)),
    ("http", "#s-angle-down", Some(HTTP)),
    ("https", "#s-angle-down", Some(HTTPS)),
    ("http", "/#s-angle-down", Some(HTTP)),
    ("https", "/#s-angle-down", Some(HTTPS)),
    ("http", dataUri, None),
    ("https", dataUri, None),
    ("http", "/account/login?redirect=https://example.com/", Some(HTTP)),
    ("https", "/account/login?redirect=https://example.com/", Some(HTTPS)),
    ("http", "//same-domain-deeplink/to-somewhere", Some(IMPLICIT)),
    ("https", "//same-domain-deeplink/to-somewhere", Some(IMPLICIT)),
    ("http", "//cdn.external-domain.com/some-big-file.RAW", Some(IMPLICIT)),
    ("https", "//cdn.external-domain.com/some-big-file.RAW", Some(IMPLICIT)),
    ("http", "somefile/some.txt", Some(HTTP)),
    ("https", "somefile/some.txt", Some(HTTPS)),
    ("https", "http://feeds.soundcloud.com/users/soundcloud:users:213461595/sounds.rss", Some(HTTP)),
    ("http", "https://example-com.cloudfront.net/example-com/images/icons/example-com-apple-touch-120x120.png", Some(HTTPS)),
    ("http", "https://example.com/rss.xml", Some(HTTPS)),
    ("http", "mailto:support@example.com", None),
    ("https", "mailto:support@example.com", None),
    ("https", "javascript:foobar();", None),
    ("https", "customPrefXix:foobar();", None),
    ("http", "", None),
    ("https", "", None),
    ("https", "//example.com", Some(IMPLICIT)),
    ("http", "//example.com", Some(IMPLICIT)),
  )

  /** (parent protocol, uri, host, parent url, expected canonical) —
    * form_full_url (uri_service.rs:157-233; the normalize block's host is
    * www.example.com, the form/protocol blocks' is example.com). */
  val canonCases: Seq[(String, String, String, String, String)] = {
    val form = Seq(
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
    ).map { case (u, want) => ("https", u, host, "", want) }
    val proto = Seq(
      ("http", "https://example.com", host, "", "https://example.com/"),
      ("https", "https://example.com", host, "", "https://example.com/"),
      ("https", "http://example.com", host, "", "http://example.com/"),
      ("http", "http://example.com", host, "", "http://example.com/"),
    )
    val normalize = Seq(
      ("https://www.example.com/", "/foo/", "https://www.example.com/foo/"),
      ("https://www.example.com", "/foo/", "https://www.example.com/foo/"),
      ("https://www.example.com/", "//foo//", "https://foo/"),
      ("https://www.example.com/", "///////foo//////", "https://foo/"),
      ("https://www.example.com/", "http-headers-explained/", "https://www.example.com/http-headers-explained/"),
      ("https://www.example.com/about/appsecurity/tools/", "../../../about/appsecurity/research/presentations/", "https://www.example.com/about/appsecurity/research/presentations/"),
      ("https://www.example.com/about/appsecurity/tools", "../../../about/appsecurity/research/presentations/", "https://www.example.com/about/appsecurity/research/presentations/"),
    ).map { case (parent, u, want) => ("https", u, "www.example.com", parent, want) }
    form ++ proto ++ normalize
  }

  /** Builder-authored regression goldens BEYOND the reference's own test
    * corpus — uppercase scheme, unknown prefixes, protocol-relative
    * same/sub/external hosts, file-path-parent relative resolution, query
    * encoding, duplicate-slash collapse. Expected values are the engine's
    * pinned outputs (consistent with the reference's rules: case-sensitive
    * scheme regexes, dot-segments resolved against the full parent path).
    * (uri, canonical, scope, protocol) against `extraHost`/`extraParent`. */
  val extraHost = "www.example.com"
  val extraParent = "https://www.example.com/dir/page.html"
  val extraCases: Seq[(String, String, String, String)] = Seq(
    ("/", "https://www.example.com/", "Root", "HTTPS"),
    ("https://www.example.com/", "https://www.example.com/", "Root", "HTTPS"),
    ("//www.example.com", "https://www.example.com//www.example.com", "SameDomain", "IMPLICIT"),
    ("#anchor", "https://www.example.com/#anchor", "Anchor", "HTTPS"),
    ("/#anchor", "https://www.example.com/#anchor", "Anchor", "HTTPS"),
    ("mailto:x@example.com", "mailto:x@example.com", "Mailto", null),
    ("data:image/png;base64,AAAA", "data:image/png;base64,AAAA", "EmbeddedImage", null),
    ("javascript:void(0)", "javascript:void(0)", "Code", null),
    ("whatsapp:send?text=hi", "whatsapp:send?text=hi", "UnknownPrefix", null),
    ("page2.html", "https://www.example.com/page2.html", "SameDomain", "HTTPS"),
    ("/abs/path", "https://www.example.com/abs/path", "SameDomain", "HTTPS"),
    ("../up/one.html", "https://www.example.com/dir/up/one.html", "SameDomain", "HTTPS"),
    ("//sub.www.example.com/x", "https://sub.www.example.com/x", "DifferentSubDomain", "IMPLICIT"),
    ("//cdn.other.net/lib.js", "https://cdn.other.net/lib.js", "External", "IMPLICIT"),
    ("https://www.example.com/a//b", "https://www.example.com/a/b", "SameDomain", "HTTPS"),
    ("https://other.example/x?q=/a b", "https://other.example/x?q=%2Fa%20b", "External", "HTTPS"),
    ("HTTPS://www.example.com/UPPER", "HTTPS:/www.example.com/UPPER", "UnknownPrefix", null),
    ("http://www.example.com/plain", "http://www.example.com/plain", "SameDomain", "HTTP"),
  )
}
