package graft.canon

import org.scalatest.funsuite.AnyFunSuite

/** Link-extraction semantics pinned by the reference
  * (reference: dom_parser/src/lib.rs:19-61 and the golden-count style of
  * dom_parser/tests/dom_parser_it.rs:7-18). */
class LinkExtractSpec extends AnyFunSuite {

  private def uris(html: String): Seq[String] =
    LinkExtract.extractLinks("https", "example.com", html).map(_.uri)

  test("first attribute among href/src/data-src wins, in attribute order") {
    // src comes first in the element → src wins
    assert(uris("""<img src="/a.png" data-src="/b.png">""") == Seq("/a.png"))
    // data-src first → data-src wins
    assert(uris("""<img data-src="/b.png" src="/a.png">""") == Seq("/b.png"))
    // non-link attrs are skipped
    assert(uris("""<a class="x" id="y" href="/z">t</a>""") == Seq("/z"))
  }

  test("one link per element, elements in document order, then sorted by uri") {
    val html = """<a href="/z"></a><a href="/a"></a><img src="/m">"""
    assert(uris(html) == Seq("/a", "/m", "/z"))
  }

  test("uri is trimmed but scope/protocol computed on raw value") {
    val links = LinkExtract.extractLinks("https", "example.com", """<a href=" /foo ">x</a>""")
    assert(links.head.uri == "/foo")
    // raw " /foo " does not match the SameDomain regex the same way "/foo" does:
    // "^(?![a-zA-Z]+://)(?:/?(?:[^#].+))$" still matches " /foo " (starts with space)
    assert(links.head.scope == Some(UriScope.SameDomain))
  }

  test("script/style contents are raw text; comments and doctype skipped") {
    val html =
      """<!DOCTYPE html><!-- <a href="/not-this"> -->
        |<script>var s = '<a href="/nor-this">';</script>
        |<style>a { background: url('x') } /* <img src="/skip"> */</style>
        |<a href="/yes">ok</a>""".stripMargin
    assert(uris(html) == Seq("/yes"))
  }

  test("unquoted and single-quoted attribute values") {
    assert(uris("<a href=/u1>x</a><a href='/u2'>y</a>") == Seq("/u1", "/u2"))
  }

  test("duplicate attribute names: first occurrence wins (html5ever)") {
    assert(uris("""<a href="/first" href="/second">x</a>""") == Seq("/first"))
  }

  test("foreign-content edges: xlink:href on the svg start tag; unquoted value ending in '/'") {
    // "adjust foreign attributes" applies to the <svg> token itself
    assert(uris("""<svg xlink:href="/x.svg"></svg>""") == Seq("/x.svg"))
    // a '/' inside an unquoted value is VALUE text, not a self-close marker:
    // the svg stays open and the inner xlink:href adjusts
    assert(uris("""<svg width=10/><use xlink:href="/icon"/></svg>""").contains("/icon"))
    // a genuinely self-closing <svg/> does NOT enter foreign content, so a
    // following xlink:href is a namespaced attribute html treats as unknown
    assert(!uris("""<svg/><use xlink:href="/no"/>""").contains("/no"))
    // outside foreign content xlink:href never links
    assert(uris("""<a xlink:href="/nope">x</a>""") == Seq())
  }

  test("rawtext parity: no RAWTEXT inside foreign content; close tag needs a delimiter") {
    // html5ever never switches to RAWTEXT in foreign content — <svg><title>
    // children are markup, so the anchor is extracted
    assert(uris("""<svg><title><a href="/x">t</a></title></svg>""") == Seq("/x"))
    // </scripty> is NOT an appropriate end tag: the script stays raw text
    // through it, so the quoted anchor is never tokenized
    assert(uris("""<script>var s = "</scripty><a href='/fake'>";</script><a href="/real">x</a>""")
      == Seq("/real"))
    // a close tag with attributes still closes (delimiter = whitespace)
    assert(uris("""<script>x</script foo="bar"><a href="/after">x</a>""") == Seq("/after"))
  }

  test("golden count fixture: exact href + src + data-src counts, sorted") {
    // 12 href + 5 src + 3 data-src = 20 links, with 2 duplicate uris
    val hrefs = (1 to 12).map(i => f"""<a href="/p$i%02d">l</a>""").mkString
    val srcs = (1 to 5).map(i => f"""<img src="/img$i%02d.png">""").mkString
    val dsrcs = (1 to 3).map(i => f"""<img data-src="/lazy$i%02d.png">""").mkString
    val dups = """<a href="/p01">dup</a><img src="/img01.png">"""
    val html = s"<html><body>$hrefs$srcs$dsrcs$dups</body></html>"
    val links = LinkExtract.extractLinks("https", "example.com", html)
    assert(links.size == 22)
    // sorted by uri
    assert(links.map(_.uri) == links.map(_.uri).sortWith((a, b) => LinkExtract.compareUtf8(a, b) < 0))
    // adjacent dedup (the service-side pass) removes the 2 duplicates
    assert(LinkExtract.dedupByUri(links).size == 20)
  }

  test("reference 530-link golden fixture: 451 href + 79 (data-)src, sorted") {
    // The reference's strongest extraction pin: a real-world 356 KB page must
    // yield exactly 451 href + 79 (data-)?src = 530 links
    // (reference: dom_parser/tests/dom_parser_it.rs:7-18, fixture
    // dom_parser/tests/resources/example.com.html — read in place, not copied)
    val fixture = java.nio.file.Paths.get(
      "/root/reference/dom_parser/tests/resources/example.com.html")
    assume(java.nio.file.Files.isReadable(fixture), "reference fixture not present")
    val html = new String(java.nio.file.Files.readAllBytes(fixture),
      java.nio.charset.StandardCharsets.UTF_8)
    val t0 = System.nanoTime()
    val links = LinkExtract.extractLinks("https", "www.example.com", html)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(links.size == 530, s"total links (tag histogram: " +
      s"${links.groupBy(_.sourceTag).view.mapValues(_.size).toMap})")
    // sorted by uri (byte order), as the reference sorts before returning
    assert(links.map(_.uri) == links.map(_.uri)
      .sortWith((a, b) => LinkExtract.compareUtf8(a, b) < 0))
    // O(n) scan guard: the 356 KB page with many <script> blocks must parse
    // in single-digit ms, not the O(n²) seconds a per-block lowercase costs
    assert(ms < 2000.0, s"extraction took ${ms}ms — scanner regressed to O(n^2)?")
  }

  test("scope and protocol attached per link") {
    val html =
      """<a href="https://example.com/team">t</a>
        |<a href="mailto:x@example.com">m</a>
        |<a href="//cdn.other.com/f.js">c</a>
        |<a href="#anchor">a</a>""".stripMargin
    val links = LinkExtract.extractLinks("https", "example.com", html)
    val byUri = links.map(l => l.uri -> (l.scope, l.protocol)).toMap
    assert(byUri("https://example.com/team") == (Some(UriScope.SameDomain), Some(UriProtocol.HTTPS)))
    assert(byUri("mailto:x@example.com") == (Some(UriScope.Mailto), None))
    assert(byUri("//cdn.other.com/f.js") == (Some(UriScope.External), Some(UriProtocol.IMPLICIT)))
    assert(byUri("#anchor") == (Some(UriScope.Anchor), Some(UriProtocol.HTTPS)))
  }
}
