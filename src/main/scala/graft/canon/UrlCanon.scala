package graft.canon

/** URI scope classification, mirroring the reference enum
  * (reference: responses/src/uri_scope.rs:3-22). String names are kept
  * identical so result tables compare 1:1.
  */
object UriScope {
  val Root             = "Root"
  val SameDomain       = "SameDomain"
  val DifferentSubDomain = "DifferentSubDomain"
  val External         = "External"
  val Anchor           = "Anchor"
  val Mailto           = "Mailto"
  val EmbeddedImage    = "EmbeddedImage"
  val Code             = "Code"
  val UnknownPrefix    = "UnknownPrefix"

  /** Scopes whose links are enqueued into the frontier
    * (reference: page_loader/src/page_loader_service.rs:151-161). */
  val enqueueable: Set[String] = Set(Root, SameDomain, DifferentSubDomain)
}

object UriProtocol {
  val HTTP     = "HTTP"
  val HTTPS    = "HTTPS"
  val IMPLICIT = "IMPLICIT"
}

/** Behavioral re-implementation of the reference's URL classifier
  * (reference: linkresult/src/link_type_checker.rs:26-92). One instance per
  * host; regexes compiled once (executor-side cached via [[LinkTypeChecker.forHost]]).
  */
final class LinkTypeChecker(host: String) {
  import java.util.regex.Pattern

  // fancy_regex::escape backslash-escapes regex metacharacters; the reference
  // then replaces "-" with a double quote — the escaped "\-" becomes "\"", a
  // literal quote in the regex (link_type_checker.rs:28, pinned by the
  // https://www.a-b-c.com → External corpus case).
  private def escapeHost(h: String): String = {
    val meta = "\\.+*?()|[]{}^$#&-~"
    val sb = new StringBuilder
    h.foreach { c => if (meta.indexOf(c) >= 0) { sb += '\\' }; sb += c }
    sb.toString.replace("-", "\"")
  }

  private val d = escapeHost(host)
  private val anchor        = Pattern.compile("^/?#")
  private val diffSub       = Pattern.compile("^//.+\\.(?:" + d + ").*\\z")
  private val diffSubProto  = Pattern.compile("^https?://[^/=?]*\\." + d + ".*\\z")
  private val external      = Pattern.compile("^//(?!" + d + ").*\\z")
  private val externalProto = Pattern.compile("^https?://.*")
  private val sameDomain    = Pattern.compile("^(?![a-zA-Z]+://)(?:/?(?:[^#].+))\\z")
  private val sameDomainProto = Pattern.compile("^https?://" + d)
  private val unknownPrefix = Pattern.compile("^(?!https?)[a-zA-Z0-9]+:.*")

  private def m(p: Pattern, uri: String): Boolean = p.matcher(uri).find()

  /** reference: link_type_checker.rs:48-70 — ordered dispatch. */
  def getUriScope(uri: String): Option[String] = uri match {
    case "/"                                     => Some(UriScope.Root)
    case u if u == host                          => Some(UriScope.Root)
    case u if u == s"$host/"                     => Some(UriScope.Root)
    case u if u == s"http://$host"               => Some(UriScope.Root)
    case u if u == s"http://$host/"              => Some(UriScope.Root)
    case u if u == s"https://$host"              => Some(UriScope.Root)
    case u if u == s"https://$host/"             => Some(UriScope.Root)
    case u if u.startsWith("mailto:")            => Some(UriScope.Mailto)
    case u if u.startsWith("data:image/")        => Some(UriScope.EmbeddedImage)
    case u if u.startsWith("javascript:")        => Some(UriScope.Code)
    case u if m(unknownPrefix, u)                => Some(UriScope.UnknownPrefix)
    case u if m(anchor, u)                       => Some(UriScope.Anchor)
    case u if m(diffSub, u)                      => Some(UriScope.DifferentSubDomain)
    case u if m(external, u)                     => Some(UriScope.External)
    case u if m(sameDomain, u)                   => Some(UriScope.SameDomain)
    case u if m(sameDomainProto, u)              => Some(UriScope.SameDomain)
    case u if m(diffSubProto, u)                 => Some(UriScope.DifferentSubDomain)
    case u if m(externalProto, u)                => Some(UriScope.External)
    case _                                       => None
  }

  /** reference: link_type_checker.rs:72-83 — note the tail call that re-checks
    * the parent protocol string as if it were a uri. */
  def getUriProtocol(parentProtocol: String, uri: String): Option[String] = uri match {
    case u if u.startsWith("https")   => Some(UriProtocol.HTTPS)
    case u if u.startsWith("http")    => Some(UriProtocol.HTTP)
    case u if u.startsWith("data:")   => None
    case u if u.startsWith("mailto:") => None
    case u if m(unknownPrefix, u)     => None
    case ""                           => None
    case u if u.startsWith("//")      => Some(UriProtocol.IMPLICIT)
    case _                            => getUriProtocol("", parentProtocol)
  }
}

object LinkTypeChecker {
  // One compiled-regex set per host, cached per executor JVM. BOUNDED: a
  // web-scale crawl sees 10^8+ hosts per executor lifetime; an unbounded
  // map is an OOM. At the ceiling each insert evicts ONE random resident
  // entry (no LRU bookkeeping under contention, and no whole-cache clear
  // whose thundering-herd recompile would stall every executor thread
  // crossing the boundary together; randomized victim choice so concurrent
  // evictors cannot collide on one entry — see [[graft.util.BoundedEvict]]).
  private val MaxEntries = 1 << 16
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, LinkTypeChecker]()
  def forHost(host: String): LinkTypeChecker = {
    val hit = cache.get(host)
    if (hit != null) hit
    else {
      if (cache.size >= MaxEntries) graft.util.BoundedEvict.evictOne(cache)
      cache.computeIfAbsent(host, h => new LinkTypeChecker(h))
    }
  }
}

/** URL canonicalization, behaviorally matching the reference's UriService
  * (reference: linkresult/src/uri_service.rs:21-149). Pure string functions —
  * registered as Spark UDFs by [[graft.crawl.FrontierRound]]; the north rule
  * allows UDFs exactly here.
  */
object UrlCanon {

  /** Percent-encode like the Rust `urlencoding` crate: every UTF-8 byte
    * except [A-Za-z0-9-._~], uppercase hex. */
  def urlEncode(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length * 3)
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~') sb += c
      else sb ++= f"%%${b & 0xff}%02X"
    }
    sb.toString
  }

  /** reference: uri_service.rs:72-104. Note Rust `str::replace` replaces ALL
    * occurrences, and `parts[1..].join("")` drops any extra '?' characters. */
  def preCleanUri(host: String, uri: String): String = {
    var cleaned = uri
    if (cleaned.contains("?")) {
      val parts = cleaned.split("\\?", -1)
      val front = preCleanUri(host, parts.head)
      val rest = urlEncode(parts.tail.mkString("")).replace("%3D", "=")
      cleaned = s"$front?$rest"
    }
    var protocol = ""
    if (cleaned.startsWith("http://")) { protocol = "http://"; cleaned = cleaned.replace("http://", "") }
    else if (cleaned.startsWith("https://")) { protocol = "https://"; cleaned = cleaned.replace("https://", "") }
    else if (cleaned.startsWith("//")) { protocol = "//"; cleaned = cleaned.replace("//", "") }
    while (cleaned.contains("//")) cleaned = cleaned.replace("//", "/")
    if (cleaned.startsWith("/") && (host.endsWith("/") || protocol == "//"))
      cleaned = cleaned.substring(1)
    protocol + cleaned
  }

  /** reference: uri_service.rs:106-136 — `../` stack resolution against the
    * parent; only applied when the uri contains "../". */
  def normalizeUrl(uri: String, parentUri: Option[String]): String = {
    if (!uri.contains("../")) return uri
    var modifiedParent = ""
    parentUri.foreach { p =>
      modifiedParent = p
      if (!modifiedParent.endsWith("/")) modifiedParent += "/"
    }
    val absolute = modifiedParent + uri
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    absolute.split("/", -1).foreach { cur =>
      if (cur != "..") out += cur
      else if (out.nonEmpty) out.remove(out.length - 1)
    }
    out.mkString("/")
  }

  /** reference: uri_service.rs:57-59 */
  def prefixWithForwardSlash(uri: String): String =
    if (uri.startsWith("/") || uri.startsWith("http://") || uri.startsWith("https://")) uri
    else "/" + uri

  /** reference: uri_service.rs:61-70 — note: any prefix "http" (even
    * "httpfoo") passes through unchanged. */
  def createUriString(protocol: String, host: String, link: String): String =
    if (link.startsWith("http")) link else s"$protocol://$host$link"

  /** reference: uri_service.rs:138-149 */
  def tryAutofixInvalidUrl(uri: String): String =
    urlEncode(uri).replace("%3A", ":").replace("%2F", "/")

  // Characters hyper::Uri accepts (RFC3986 unreserved + reserved + '%' + '#').
  private def isUriChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      "-._~:/?#[]@!$&'()*+,;=%".indexOf(c) >= 0

  private def parses(s: String): Boolean = s.nonEmpty && s.forall(isUriChar)

  private val bareAuthority = java.util.regex.Pattern.compile("^https?://[^/?#]+$")

  /** hyper::Uri Display: a scheme://authority uri with no path renders with a
    * trailing "/" (pinned by uri_service.rs:217 "https://foo/"). */
  private def displayUri(s: String): String =
    if (bareAuthority.matcher(s).find()) s + "/" else s

  /** Emulates hyper::Uri parse + Display: invalid chars trigger the autofix
    * (uri_service.rs:26-31). */
  def toUri(input: String): String =
    displayUri(if (parses(input)) input else tryAutofixInvalidUrl(input))

  /** reference: uri_service.rs:21-54 — the canonicalization entry point.
    * @param protocol  parent page protocol ("http"/"https")
    * @param uri       raw link value (trimmed)
    * @param host      parent page host
    * @param parentUri parent page url (for `../` resolution)
    */
  def formFullUrl(protocol: String, uri: String, host: String, parentUri: Option[String]): String = {
    val pre = preCleanUri(host, uri)
    val protocolInternal =
      if (pre.startsWith("https://")) "https"
      else if (pre.startsWith("http://")) "http"
      else protocol
    val checker = LinkTypeChecker.forHost(host)

    def doNormalize(u: String): String = {
      val normalized = normalizeUrl(u, parentUri)
      val adjusted = prefixWithForwardSlash(normalized)
      toUri(createUriString(protocolInternal, host, adjusted))
    }

    checker.getUriScope(pre) match {
      case Some(UriScope.Root) => toUri(createUriString(protocolInternal, host, "/"))
      case Some(UriScope.SameDomain) => doNormalize(pre)
      case Some(UriScope.Anchor) => doNormalize(pre)
      case Some(_) =>
        checker.getUriProtocol(protocol, pre) match {
          case Some(UriProtocol.IMPLICIT) => displayUri(s"$protocolInternal:$pre")
          case _ => toUri(pre)
        }
      case None => toUri(pre)
    }
  }

  /** Host extraction from an absolute url (reference: page_request.rs:34-38
    * via hyper Uri). Handles userinfo/port/ipv6 minimally — crawl urls are
    * formed by [[formFullUrl]] so they are scheme://host... shaped. */
  def hostOf(url: String): Option[String] = {
    val i = url.indexOf("://")
    if (i < 0) return None
    var rest = url.substring(i + 3)
    val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (end >= 0) rest = rest.substring(0, end)
    val at = rest.lastIndexOf('@')
    if (at >= 0) rest = rest.substring(at + 1)
    if (rest.startsWith("[")) { // ipv6
      val close = rest.indexOf(']')
      if (close > 0) return Some(rest.substring(0, close + 1))
    }
    val colon = rest.indexOf(':')
    if (colon >= 0) rest = rest.substring(0, colon)
    if (rest.isEmpty) None else Some(rest)
  }

  /** Scheme extraction (reference: page_request.rs:29-32). */
  def protocolOf(url: String): Option[String] = {
    val i = url.indexOf("://")
    if (i <= 0) None else Some(url.substring(0, i))
  }
}
