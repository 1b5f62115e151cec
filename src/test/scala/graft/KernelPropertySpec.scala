package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.canon.{LinkExtract, LinkTypeChecker, UriProtocol, UriScope, UrlCanon}
import graft.crawl.SimCrawler
import graft.model.CrawlConfig
import graft.robots.Robots
import graft.synth.Synth

/** Property-based tests over the pure kernels (SURVEY §5: ScalaCheck for
  * canonicalization idempotence and seen-set monotonicity). No SparkSession —
  * every property here exercises the executor-side scalar kernels directly,
  * so hundreds of cases run in milliseconds.
  *
  * Properties are stated only where they are TRUE of the reference semantics:
  * `form_full_url` is deliberately NOT idempotent on query strings (the
  * reference re-percent-encodes everything after `?` on every pass,
  * uri_service.rs:72-104) nor on uris containing `../` (normalize joins the
  * parent BEFORE stack-resolution, uri_service.rs:106-136, so a second pass
  * re-joins the parent). The idempotence domain below — URI-charset inputs
  * without `?` and without `..` — is exactly the fixpoint domain.
  */
class KernelPropertySpec extends AnyFunSuite {

  /** Deterministic runs: fixed initial seed, so a failure here reproduces. */
  private def check(prop: Prop, cases: Int = 300): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(Seed(0x9e3779b97f4a7c15L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  // ---------------------------------------------------------------- gens

  private val genHost: Gen[String] = Gen.oneOf(
    "example.com", "www.example.com", "a-b-c.com", "host0.test",
    "sub.news.example.org", "x.io")

  private val genProtocol: Gen[String] = Gen.oneOf("http", "https")

  /** RFC3986 charset (what hyper::Uri accepts) minus '?', and never the
    * substring ".." — the proven fixpoint domain of form_full_url. */
  private val uriChars: Seq[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "-._~:/#[]@!$&'()*+,;=%").toSeq
  private val genCleanUri: Gen[String] = Gen.choose(0, 24)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(uriChars)).map(_.mkString))
    .map(_.replaceAll("\\.{2,}", ".")) // a run of dots can hide ".." from single-pass replace

  /** Messier link-ish strings: structured prefixes over a wider charset
    * (spaces, quotes, '?', unicode) to stress the dispatch + autofix paths. */
  private val genMessyUri: Gen[String] = {
    val raw = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        (10, Gen.oneOf(uriChars)),
        (2, Gen.const(' ')),
        (1, Gen.const('?')),
        (1, Gen.const('"')),
        (1, Gen.const('ü')),
        (1, Gen.const('\u00e9')))).map(_.mkString))
    val prefix = Gen.oneOf("", "/", "//", "#", "/#", "http://", "https://",
      "mailto:", "data:image/png;", "javascript:", "tel:", "../", "./")
    Gen.zip(prefix, raw).map { case (p, r) => p + r }
  }

  private def genParent(host: String): Gen[Option[String]] = Gen.oneOf(
    Gen.const(None),
    Gen.alphaNumStr.map(p => Some(s"https://$host/${p.take(10)}")),
    Gen.alphaNumStr.map(p => Some(s"https://$host/${p.take(10)}/")))

  private case class CanonCase(proto: String, uri: String, host: String,
      parent: Option[String])

  private def genCanonCase(genUri: Gen[String]): Gen[CanonCase] = for {
    p <- genProtocol
    h <- genHost
    u <- genUri
    par <- genParent(h)
  } yield CanonCase(p, u, h, par)

  // ------------------------------------------------- canonicalization

  test("property: form_full_url is idempotent on its fixpoint domain") {
    check(Prop.forAllNoShrink(genCanonCase(genCleanUri)) { c =>
      val once = UrlCanon.formFullUrl(c.proto, c.uri, c.host, c.parent)
      val twice = UrlCanon.formFullUrl(c.proto, once, c.host, c.parent)
      Prop(twice == once) :| s"once=$once twice=$twice"
    }, cases = 800)
  }

  test("property: form_full_url stabilizes within two passes when its output is URI-clean") {
    // messy inputs (spaces, quotes, unicode) route through the autofix, and
    // the ENCODED output can re-classify on the next pass (e.g. "é" →
    // autofix "%C3%A9" → long enough to match the SameDomain regex →
    // "https://host/%C3%A9" — matching the reference, whose scope regexes
    // also see the raw vs encoded forms differently). So one pass is not a
    // fixpoint in general; the second pass must be: once the input is
    // URI-clean, no autofix can fire again and the dispatch is stable.
    val uriCharSet = uriChars.toSet
    check(Prop.forAllNoShrink(genCanonCase(genMessyUri)) { c =>
      val o1 = UrlCanon.formFullUrl(c.proto, c.uri, c.host, c.parent)
      if (o1.forall(uriCharSet) && !o1.contains("?") && !o1.contains("..")) {
        val o2 = UrlCanon.formFullUrl(c.proto, o1, c.host, c.parent)
        val o3 = UrlCanon.formFullUrl(c.proto, o2, c.host, c.parent)
        Prop(o3 == o2) :| s"o1=$o1 o2=$o2 o3=$o3"
      } else Prop.passed // '?' re-encode / '../' re-join: non-idempotent by design
    }, cases = 800)
  }

  test("property: scope dispatch is total and closed over the reference enum") {
    val scopes = Set(UriScope.Root, UriScope.SameDomain,
      UriScope.DifferentSubDomain, UriScope.External, UriScope.Anchor,
      UriScope.Mailto, UriScope.EmbeddedImage, UriScope.Code,
      UriScope.UnknownPrefix)
    val genAnyHost = Gen.oneOf(genHost, Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""), Gen.const("a-b"), Gen.const("a(b.com"))
    check(Prop.forAllNoShrink(genAnyHost, genMessyUri) { (h, u) =>
      val checker = LinkTypeChecker.forHost(h)
      val s = checker.getUriScope(u)          // must not throw
      val p = checker.getUriProtocol("https", u)
      Prop(s.forall(scopes.contains) &&
        p.forall(Set(UriProtocol.HTTP, UriProtocol.HTTPS,
          UriProtocol.IMPLICIT).contains))
    }, cases = 600)
  }

  test("property: form_full_url is total on arbitrary printable input") {
    check(Prop.forAllNoShrink(genCanonCase(genMessyUri)) { c =>
      Prop(UrlCanon.formFullUrl(c.proto, c.uri, c.host, c.parent) != null)
    }, cases = 600)
  }

  test("property: pre_clean_uri is idempotent on '?'-free input and never leaves '//' in the remainder") {
    check(Prop.forAllNoShrink(genHost, genMessyUri) { (h, u0) =>
      val u = u0.replace("?", "")
      val once = UrlCanon.preCleanUri(h, u)
      val remainder =
        if (once.startsWith("http://")) once.drop(7)
        else if (once.startsWith("https://")) once.drop(8)
        else if (once.startsWith("//")) once.drop(2)
        else once
      Prop(UrlCanon.preCleanUri(h, once) == once && !remainder.contains("//")) :|
        s"once=$once"
    }, cases = 600)
  }

  test("property: normalize_url removes every '..' segment, and is identity without '../'") {
    val genSegs = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.const(".."), Gen.alphaNumStr.map(s => if (s.isEmpty) "a" else s.take(6)))))
      .map(_.mkString("/"))
    check(Prop.forAllNoShrink(genSegs, genParent("example.com")) { (uri, parent) =>
      val out = UrlCanon.normalizeUrl(uri, parent)
      if (uri.contains("../"))
        Prop(!out.split("/", -1).contains("..")) :| s"out=$out"
      else Prop(out == uri)
    }, cases = 600)
  }

  test("property: prefix slash is idempotent and produces rooted-or-absolute uris") {
    check(Prop.forAllNoShrink(genMessyUri) { u =>
      val once = UrlCanon.prefixWithForwardSlash(u)
      Prop(UrlCanon.prefixWithForwardSlash(once) == once &&
        (once.startsWith("/") || once.startsWith("http://") || once.startsWith("https://")))
    })
  }

  test("property: urlEncode round-trips byte-exactly and emits only unreserved+'%'") {
    val ok = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ "-._~%").toSet
    check(Prop.forAllNoShrink(Gen.asciiPrintableStr,
        Gen.listOf(Gen.oneOf("ü", "é", "学", "🕷", "ß"))) { (a, extra) =>
      val s = a + extra.mkString
      val enc = UrlCanon.urlEncode(s)
      // decode to BYTES (a String round-trip would mangle nothing here, but
      // byte comparison keeps the property airtight for any future charset)
      val out = new java.io.ByteArrayOutputStream
      var i = 0
      while (i < enc.length) {
        if (enc.charAt(i) == '%') { out.write(Integer.parseInt(enc.substring(i + 1, i + 3), 16)); i += 3 }
        else { out.write(enc.charAt(i).toInt); i += 1 }
      }
      Prop(enc.forall(ok) && java.util.Arrays.equals(out.toByteArray,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }, cases = 600)
  }

  test("property: autofix output always parses as a hyper-style uri") {
    val accepted = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ "-._~:/%").toSet
    check(Prop.forAllNoShrink(genMessyUri) { u =>
      Prop(UrlCanon.tryAutofixInvalidUrl(u).forall(accepted))
    })
  }

  test("property: hostOf/protocolOf invert url formation") {
    val genSimpleHost = Gen.choose(1, 3).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 8).flatMap(m => Gen.listOfN(m, Gen.alphaLowerChar).map(_.mkString))))
      .map(_.mkString("."))
    check(Prop.forAllNoShrink(genProtocol, genSimpleHost, Gen.alphaNumStr) { (p, h, path) =>
      val url = s"$p://$h/${path.take(12)}"
      Prop(UrlCanon.hostOf(url).contains(h) && UrlCanon.protocolOf(url).contains(p))
    })
    // one-off shapes the generator doesn't cover
    assert(UrlCanon.hostOf("https://user@h.test:8080/x").contains("h.test"))
    assert(UrlCanon.hostOf("https://[::1]:443/x").contains("[::1]"))
    assert(UrlCanon.hostOf("nourl").isEmpty && UrlCanon.protocolOf("nourl").isEmpty)
  }

  test("property: compareUtf8 agrees with UTF-8 byte order on arbitrary unicode") {
    // well-formed strings only (fragments, so the spider emoji arrives as
    // a full surrogate pair): code-point order == UTF-8 byte order exactly
    // there, and the supplementary-plane fragment is the case the function
    // exists for (Java String order ranks it by its high surrogate instead)
    val genU = Gen.listOf(Gen.frequency(
      (8, Gen.asciiPrintableChar.map(_.toString)),
      (2, Gen.oneOf("ü", "学", "🕷", "ß", "é"))))
      .map(_.mkString)
    check(Prop.forAllNoShrink(genU, genU) { (a, b) =>
      // UNSIGNED byte comparison: Rust compares u8; Java's Arrays.compare
      // on byte[] is signed and would rank all multi-byte UTF-8 (0x80+)
      // BELOW ascii
      val expected = java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Prop(Integer.signum(LinkExtract.compareUtf8(a, b)) == Integer.signum(expected))
    }, cases = 600)
  }

  // --------------------------------------------------- link extraction

  private val genHtmlSoup: Gen[String] = {
    val attrVal = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.frequency((8, Gen.alphaNumChar), (1, Gen.oneOf('/', ':', '#', '.', ' ', '?'))))
      .map(_.mkString))
    val attr = for {
      name <- Gen.oneOf("href", "src", "data-src", "id", "class", "data-x")
      v <- attrVal
      style <- Gen.oneOf(0, 1, 2, 3)
    } yield style match {
      case 0 => s"""$name="$v""""
      case 1 => s"$name='$v'"
      case 2 => s"$name=${v.replace(" ", "")}"
      case _ => name // valueless attribute
    }
    val tag = Gen.oneOf("a", "img", "div", "script", "style", "title", "svg",
      "use", "link", "iframe", "br")
    val fragment = Gen.frequency(
      (6, for { t <- tag; as <- Gen.listOf(attr) } yield s"<$t ${as.mkString(" ")}>"),
      (2, tag.map(t => s"</$t>")),
      (2, Gen.asciiPrintableStr.map(_.take(20))),
      (1, Gen.asciiPrintableStr.map(s => s"<!-- ${s.take(10)} -->")),
      (1, Gen.const("<![CDATA[ <a href=x> ]]>")),
      (1, Gen.const("<!DOCTYPE html>")),
      (1, Gen.oneOf("<", ">", "<<", "< a", "<a", "&amp;")))
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString)
  }

  test("property: link extraction is total, sorted by utf-8 byte order, trimmed, and dedups to distinct uris") {
    check(Prop.forAllNoShrink(genHost, genHtmlSoup) { (h, body) =>
      val links = LinkExtract.extractLinks("https", h, body) // must not throw
      val sorted = links.map(_.uri).sliding(2).forall {
        case Seq(a, b) => LinkExtract.compareUtf8(a, b) <= 0
        case _ => true
      }
      val trimmed = links.forall(l => l.uri == l.uri.trim)
      val dd = LinkExtract.dedupByUri(links).map(_.uri)
      val strict = dd.sliding(2).forall {
        case Seq(a, b) => LinkExtract.compareUtf8(a, b) < 0
        case _ => true
      }
      Prop(sorted && trimmed && strict) :| s"links=${links.take(5)}"
    }, cases = 400)
  }

  // ------------------------------------------------------------ robots

  private val genRobotsBody: Gen[String] = {
    val path = Gen.alphaNumStr.map(s => "/" + s.take(8))
    val line = Gen.frequency(
      (3, Gen.oneOf("tarantula", "*", "other").map(a => s"User-agent: $a")),
      (3, path.map(p => s"Disallow: $p")),
      (2, path.map(p => s"Allow: $p")),
      (1, Gen.const("Disallow:")),
      (1, Gen.const("Crawl-delay: 5")),
      (1, Gen.asciiPrintableStr.map(s => s"# ${s.take(12)}")),
      (1, Gen.asciiPrintableStr.map(_.take(16))),
      (1, Gen.const("")))
    Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, line)).map(_.mkString("\n"))
  }

  test("property: robots parse is total, cache-transparent, and precedence is pinned") {
    check(Prop.forAllNoShrink(genRobotsBody, Gen.alphaNumStr) { (body, p) =>
      val url = s"https://example.com/${p.take(8)}"
      val parsed = Robots.parse(body) // must not throw
      val viaCache = Robots.parseCached(body)
      val decision1 = Robots.canAccess(disallowAll = false, allowAll = false, body, "tarantula", url)
      val decision2 = Robots.canAccess(disallowAll = false, allowAll = false, body, "tarantula", url)
      Prop(parsed == viaCache &&                        // cache returns the same parse
        decision1 == decision2 &&                       // rule evaluation is deterministic
        !Robots.canAccess(disallowAll = true, allowAll = true, body, "tarantula", url) &&
        Robots.canAccess(disallowAll = false, allowAll = true, body, "tarantula", url))
    }, cases = 400)
  }

  // --------------------------------------- crawl loop (sequential oracle)

  test("property: crawl is seen-monotone, round-prefix-stable, and depth-bounded") {
    // SURVEY §5's "seen-set monotonicity", stated on the independent
    // sequential oracle (pure, so hundreds of graphs are cheap): extending
    // the round budget by one must (a) only ADD to the final seen set,
    // (b) leave all earlier rounds' emitted rows byte-identical (the loop's
    // state is a pure function of prior rounds), and every run must keep
    // (c) result urls inside its own seen set and (d) depth <= maxDepth.
    val genCase = for {
      seed <- Gen.choose(0L, 1000000L)
      hosts <- Gen.choose(1, 3)
      pph <- Gen.choose(3, 8)
      fan <- Gen.choose(1, 4)
      depth <- Gen.choose(0, 3)
      quota <- Gen.choose(1, 3)
      rounds <- Gen.choose(1, 5)
    } yield (seed, hosts, pph, fan, depth, quota, rounds)
    check(Prop.forAllNoShrink(genCase) { case (seed, hosts, pph, fan, depth, quota, rounds) =>
      val g = Synth.graph(seed, hosts, pph, fanout = fan)
      val cfg = CrawlConfig(maxDepth = depth, hostQuotaPerRound = quota,
        maxRounds = rounds)
      val a = SimCrawler.run(g.pages, g.robots, g.redirects, g.seeds, cfg)
      val b = SimCrawler.run(g.pages, g.robots, g.redirects, g.seeds,
        cfg.copy(maxRounds = rounds + 1))
      val prefixStable = a.results == b.results.filter(_.round < rounds)
      val seenMonotone = a.seen.subsetOf(b.seen)
      val urlsSeen = a.results.forall(r => a.seen.contains(r.url))
      val depthBounded = depth == 0 || a.results.forall(_.depth <= depth)
      (Prop(prefixStable) :| "round-prefix changed under a longer budget") &&
        (Prop(seenMonotone) :| "seen set shrank under a longer budget") &&
        (Prop(urlsSeen) :| "emitted url missing from seen") &&
        (Prop(depthBounded) :| "depth bound violated")
    }, cases = 80)
  }

  test("property: cuckoo filter has no false negatives, exact occupancy, and deterministic bytes under insert/delete interleavings") {
    // the FrontierFilter correctness contract ([[graft.crawl.CuckooFilter]]):
    // under any history where deletes target live inserts (which the
    // frontier protocol guarantees), (a) every live item probes true,
    // (b) each successful insert fills exactly one slot and each delete
    // frees exactly one, (c) the same history replays to identical bytes
    // (resume determinism), (d) bytes round-trip through serialization.
    val genCase = for {
      seed <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(50, 1500)
      churn <- Gen.choose(0.0, 0.9)
    } yield (seed, n, churn)
    check(Prop.forAllNoShrink(genCase) { case (seed, n, churn) =>
      def run(): (graft.crawl.CuckooFilter, Set[Long]) = {
        val rnd = new scala.util.Random(seed)
        val f = graft.crawl.CuckooFilter.create(n.toLong)
        var live = Set.empty[Long]
        var ok = true
        (0 until n).foreach { _ =>
          if (live.nonEmpty && rnd.nextDouble() < churn) {
            val victim = live.iterator.drop(rnd.nextInt(live.size)).next()
            ok &= f.delete(victim)
            live -= victim
          }
          val h = rnd.nextLong()
          if (!live.contains(h)) { ok &= f.insert(h); live += h }
        }
        assert(ok, "sized inserts/live deletes must all succeed")
        (f, live)
      }
      val (f, live) = run()
      val (f2, _) = run()
      val bytes = f.serialized
      val noFalseNeg = live.forall(f.mightContain)
      val occupancy = f.occupied == live.size
      val deterministic = java.util.Arrays.equals(bytes, f2.serialized)
      val back = graft.crawl.CuckooFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      val roundTrip = java.util.Arrays.equals(back.serialized, bytes) &&
        live.forall(back.mightContain)
      (Prop(noFalseNeg) :| "false negative on a live item") &&
        (Prop(occupancy) :| "occupancy drifted from the live count") &&
        (Prop(deterministic) :| "same history gave different bytes") &&
        (Prop(roundTrip) :| "serialization round-trip changed the filter")
    }, cases = 120)
  }
}
