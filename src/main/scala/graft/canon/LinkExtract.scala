package graft.canon

/** One extracted link (reference: responses/src/link.rs:7-13 — equality is by
  * uri only, which drives the dedup semantics downstream). */
final case class ExtractedLink(
    uri: String,            // trimmed attribute value (dom_parser/src/lib.rs:54)
    scope: Option[String],  // computed on the UNTRIMMED value (lib.rs:55)
    protocol: Option[String],
    sourceTag: String)

/** Tolerant HTML link extraction, behaviorally matching the reference's
  * DomParserService (reference: dom_parser/src/lib.rs:19-61):
  *   - elements visited in document order;
  *   - per element, the FIRST attribute (in attribute order) named
  *     href / src / data-src yields at most one link (lib.rs:46-52);
  *   - uri = trimmed value, scope/protocol computed on the raw value;
  *   - result sorted by uri, byte-lexicographically (lib.rs:25).
  *
  * Hand-rolled scanner (offline sbt: no jsoup); handles comments, doctype,
  * CDATA, raw-text elements (script/style) and RCDATA (title/textarea),
  * quoted/unquoted attributes, duplicate attributes (first occurrence wins,
  * as in html5ever).
  */
object LinkExtract {
  private val linkAttrs = Set("href", "src", "data-src")
  // html5ever raw-text/RCDATA elements with scripting enabled (scraper's
  // parse mode): their content is TEXT, not markup — including <noscript>
  // and <iframe>, whose inner fallback markup the reference never sees
  private val rawText = Set("script", "style", "title", "textarea", "xmp",
    "iframe", "noembed", "noframes", "noscript")

  def extractLinks(parentProtocol: String, host: String, body: String): Seq[ExtractedLink] = {
    val checker = LinkTypeChecker.forHost(host)
    val out = scala.collection.mutable.ArrayBuffer.empty[ExtractedLink]
    val n = body.length
    var i = 0
    // foreign-content depth (<svg>/<math> subtrees): html5ever's "adjust
    // foreign attributes" step gives `xlink:href` the local name `href`
    // there, so SVG <use xlink:href> IS a link (451-href golden fixture)
    var foreignDepth = 0
    while (i < n) {
      val lt = body.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (lt + 1 >= n) { i = n }
      else {
        val c = body.charAt(lt + 1)
        if (c == '!') {
          if (body.startsWith("<!--", lt)) {
            val end = body.indexOf("-->", lt + 4)
            i = if (end < 0) n else end + 3
          } else if (body.startsWith("<![CDATA[", lt)) {
            val end = body.indexOf("]]>", lt + 9)
            i = if (end < 0) n else end + 3
          } else {
            val end = body.indexOf('>', lt + 1)
            i = if (end < 0) n else end + 1
          }
        } else if (c == '?') {
          val end = body.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (c == '/') {
          // close tag: track exit from foreign content
          var j = lt + 2
          while (j < n && (body.charAt(j).isLetterOrDigit || body.charAt(j) == '-' || body.charAt(j) == ':')) j += 1
          val closeTag = body.substring(lt + 2, j).toLowerCase
          if ((closeTag == "svg" || closeTag == "math") && foreignDepth > 0) foreignDepth -= 1
          val end = body.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (c.isLetter) {
          // element open tag
          var j = lt + 1
          while (j < n && (body.charAt(j).isLetterOrDigit || body.charAt(j) == '-' || body.charAt(j) == ':')) j += 1
          val tag = body.substring(lt + 1, j).toLowerCase
          // html5ever applies "adjust foreign attributes" to the <svg>/<math>
          // start tag token ITSELF, not just to its descendants
          val inForeign = foreignDepth > 0 || tag == "svg" || tag == "math"
          // parse attributes until '>' (respecting quotes)
          var firstLink: Option[String] = null.asInstanceOf[Option[String]]
          firstLink = None
          val seenAttrs = scala.collection.mutable.HashSet.empty[String]
          var done = false
          // set when the char immediately before '>' is a STANDALONE solidus
          // (tokenizer self-closing-start-tag state); a '/' inside an
          // unquoted attribute value is value text, not a self-close marker
          var selfClosing = false
          while (!done && j < n) {
            // skip whitespace and '/'
            while (j < n && (body.charAt(j).isWhitespace || body.charAt(j) == '/')) {
              selfClosing = body.charAt(j) == '/'
              j += 1
            }
            if (j >= n || body.charAt(j) == '>') { done = true }
            else {
              selfClosing = false
              // attribute name
              val nameStart = j
              while (j < n && !body.charAt(j).isWhitespace && body.charAt(j) != '=' &&
                     body.charAt(j) != '>' && body.charAt(j) != '/') j += 1
              val name = body.substring(nameStart, j).toLowerCase
              while (j < n && body.charAt(j).isWhitespace) j += 1
              var value = ""
              if (j < n && body.charAt(j) == '=') {
                j += 1
                while (j < n && body.charAt(j).isWhitespace) j += 1
                if (j < n && (body.charAt(j) == '"' || body.charAt(j) == '\'')) {
                  val q = body.charAt(j)
                  val end = body.indexOf(q, j + 1)
                  if (end < 0) { value = body.substring(j + 1); j = n }
                  else { value = body.substring(j + 1, end); j = end + 1 }
                } else {
                  val valStart = j
                  while (j < n && !body.charAt(j).isWhitespace && body.charAt(j) != '>') j += 1
                  value = body.substring(valStart, j)
                }
              }
              if (name.nonEmpty && seenAttrs.add(name)) {
                // foreign-attribute adjustment: xlink:href → href on and
                // inside svg/math
                val effName = if (inForeign && name == "xlink:href") "href" else name
                if (firstLink.isEmpty && linkAttrs.contains(effName)) firstLink = Some(value)
              }
            }
          }
          // html5ever honors the self-closing solidus only for FOREIGN
          // elements; HTML elements ignore it (a non-void HTML element
          // still wraps content)
          if ((tag == "svg" || tag == "math") && !(selfClosing && j < n)) foreignDepth += 1
          i = if (j < n) j + 1 else n
          firstLink.foreach { raw =>
            out += ExtractedLink(
              uri = raw.trim,
              scope = checker.getUriScope(raw),
              protocol = checker.getUriProtocol(parentProtocol, raw),
              sourceTag = tag)
          }
          // skip raw-text / RCDATA content up to the matching close tag
          // (case-insensitive in-place scan — never copies the body; a page
          // with many <script> blocks must stay O(n), not O(n * blocks)).
          // NOT inside foreign content: html5ever never switches to RAWTEXT
          // there — <svg><title> children are ordinary foreign markup
          if (foreignDepth == 0 && rawText.contains(tag)) {
            val close = indexOfCloseTag(body, tag, i)
            if (close < 0) i = n
            else {
              val end = body.indexOf('>', close)
              i = if (end < 0) n else end + 1
            }
          }
        } else {
          i = lt + 1
        }
      }
    }
    // byte-lexicographic (= code point) sort, matching Rust String cmp
    out.sortWith((a, b) => compareUtf8(a.uri, b.uri) < 0).toSeq
  }

  /** Case-insensitive scan for `</tag` starting at `from`; -1 if absent.
    * `tag` must already be lowercase. An "appropriate end tag" must be
    * FOLLOWED by whitespace, '/', or '>' (tokenizer script-data-end-tag-name
    * state) — `</scripty>` does not terminate a `<script>` block. */
  private def indexOfCloseTag(body: String, tag: String, from: Int): Int = {
    val n = body.length
    val m = tag.length
    var i = from
    while (i + m + 2 < n) {
      if (body.charAt(i) == '<' && body.charAt(i + 1) == '/' &&
          body.regionMatches(true, i + 2, tag, 0, m)) {
        val d = body.charAt(i + 2 + m)
        if (d.isWhitespace || d == '/' || d == '>') return i
      }
      i += 1
    }
    -1
  }

  /** Compare as UTF-8 byte sequences (Rust String Ord). Differs from Java
    * String compare only for supplementary-plane chars. */
  def compareUtf8(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Adjacent-dedup by uri after the sort — full per-page dedup
    * (reference: page_loader_service.rs:143-144 on the pre-sorted list). */
  def dedupByUri(links: Seq[ExtractedLink]): Seq[ExtractedLink] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ExtractedLink]
    links.foreach { l => if (out.isEmpty || out.last.uri != l.uri) out += l }
    out.toSeq
  }
}
