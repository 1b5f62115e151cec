package graft.synth

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Page, RedirectRow, RobotsRow}

/** Deterministic synthesizer of the crawl fixtures (FIXTURES.md §1-§4):
  * a pages link-graph honoring the input_hint schema exactly, a robots
  * fixture exercising the reference's status dispatch, and redirect chains
  * incl. over-budget ones. Seeded (seed=42 convention); no wall clock, no
  * shared Random — every value is a pure hash of its coordinates, so
  * generation is partition-parallel and scale-free.
  */
object Synth {

  /** splitmix64 — deterministic, splittable. */
  def mix(seed: Long, ks: Long*): Long = {
    var z = seed
    ks.foreach { k =>
      z += 0x9e3779b97f4a7c15L + k
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b5L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
    }
    z & Long.MaxValue
  }

  def host(h: Int) = s"host$h.test"
  def pageUrl(h: Int, i: Int): String =
    if (i == 0) s"https://${host(h)}/" else s"https://${host(h)}/page/$i"

  private val langs = Array("en", "de", "fr", "es", "it")

  final case class Graph(pages: Seq[Page], robots: Seq[RobotsRow], redirects: Seq[RedirectRow], seeds: Seq[String])

  /** H hosts × P pages. Page (h,i) links to a pseudo-random same-domain
    * subset, plus noise links drawn from the reference corpora's classes
    * (anchors, mailto, javascript, data-uris, protocol-relative externals,
    * different-subdomain), plus occasional dead links and redirect entry
    * points. ~8% of referenced pages are missing (ConnectionError path).
    */
  def graph(seed: Long, hosts: Int, pagesPerHost: Int, fanout: Int = 4): Graph = {
    val pages = for {
      h <- 0 until hosts
      i <- 0 until pagesPerHost
      if mix(seed, 1, h, i) % 100 >= 8 || i == 0 // ~8% missing, roots always exist
    } yield {
      val sb = new StringBuilder("<html><head><title>p</title></head><body>")
      // same-domain children
      (0 until fanout).foreach { s =>
        val j = (mix(seed, 2, h, i, s) % pagesPerHost).toInt
        val form = mix(seed, 3, h, i, s) % 4
        val target =
          if (form == 0) (if (j == 0) "/" else s"/page/$j")
          else if (form == 1) pageUrl(h, j)
          else if (form == 2) (if (j == 0) "/" else s"page/$j") // relative, no slash
          else s"/page/$j#frag-$s" // same-domain... note: has fragment
        sb ++= s"""<a href="$target">l$s</a>"""
      }
      // a redirect entry point sometimes
      if (mix(seed, 4, h, i) % 5 == 0)
        sb ++= s"""<a href="/r/${(mix(seed, 5, h, i) % 8).toInt}">r</a>"""
      // noise classes (never enqueued, but classified + counted)
      sb ++= """<a href="#top">t</a>"""
      sb ++= """<a href="mailto:x@test">m</a>"""
      sb ++= """<a href="javascript:void(0)">j</a>"""
      sb ++= s"""<img src="//cdn.external.test/img/$i.png">"""
      sb ++= s"""<a href="https://other$h.example/x">e</a>"""
      if (mix(seed, 6, h, i) % 3 == 0)
        sb ++= s"""<a href="//sub.${host(h)}/page/${(mix(seed, 7, h, i) % pagesPerHost).toInt}">s</a>"""
      // occasional dead link
      if (mix(seed, 8, h, i) % 4 == 0)
        sb ++= s"""<a href="/dead/${(mix(seed, 9, h, i) % 100).toInt}">d</a>"""
      sb ++= "</body></html>"
      val html = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val text = s"document text for ${host(h)} page $i :: ${mix(seed, 10, h, i)}"
      // header/status variants (non-roots only, so seeds crawl normally):
      // F9 — mixed-case keys the engine must lowercase; F5 — a
      // cloudfront-cached 503 that still downloads, a plain 404 that must
      // NOT download; F10 — non-2xx codes get labeled
      val roll = if (i == 0) -1L else mix(seed, 20, h, i) % 11
      val (status, headers): (Integer, Map[String, String]) =
        if (roll == 5) (Int.box(503), Map(
          "Content-Type" -> "text/html; charset=utf-8",
          "X-Cache" -> "Error from cloudfront"))
        else if (roll == 6) (Int.box(404), Map("Content-Type" -> "text/html"))
        else if (roll == 7) (Int.box(200), Map(
          "Content-Type" -> "text/html",
          "X-Cache" -> "Hit from cloudfront", "X-Served-By" -> "cache-a"))
        // headers present but NO content-type: reference is_html requires
        // the key, so this page must NOT download despite its 200 + html
        else if (roll == 8) (Int.box(200), Map("X-Served-By" -> "cache-b"))
        else (null, null)
      Page(pageUrl(h, i), new Timestamp(1600000000000L + mix(seed, 11, h, i) % 100000000L),
        html, text, langs((mix(seed, 12, h, i) % langs.length).toInt),
        headers, status)
    }

    // subdomain pages exist too (DifferentSubDomain links are enqueueable)
    val subPages = for {
      h <- 0 until hosts
      i <- 0 until pagesPerHost
      if mix(seed, 13, h, i) % 3 == 0
    } yield Page(
      s"https://sub.${host(h)}/page/$i",
      new Timestamp(1600000000000L + mix(seed, 14, h, i) % 100000000L),
      s"""<html><body><a href="https://${host(h)}/">up</a></body></html>""".getBytes("UTF-8"),
      s"subdomain text $h/$i :: ${mix(seed, 15, h, i)}",
      langs((mix(seed, 16, h, i) % langs.length).toInt))

    // robots: host0 parses rules (blocks /page/1*), host1 % 5 == 1 → 403
    // (disallow_all), h%5==2 → 404 (allow_all), h%5==3 → 500 (no rules →
    // default allow), h%5==4 → no robots row at all (default allow)
    val robots = (0 until hosts).flatMap { h =>
      h % 5 match {
        case 0 => Some(RobotsRow(host(h), 200,
          s"user-agent: tarantula\ndisallow: /page/1\nallow: /page/10$$\n\nuser-agent: *\ndisallow:\n"))
        case 1 => Some(RobotsRow(host(h), 403, ""))
        case 2 => Some(RobotsRow(host(h), 404, ""))
        case 3 => Some(RobotsRow(host(h), 500, ""))
        case _ => None
      }
    }

    // redirect chains: /r/0../r/7 per host; /r/n → /r/n+1 for n<chainLen,
    // tail lands on a real page. One host gets an over-budget chain.
    val redirects = (0 until hosts).flatMap { h =>
      val chainLen = if (h == 0) 12 else (mix(seed, 17, h) % 3 + 1).toInt
      (0 until 8).flatMap { n =>
        if (n < chainLen) {
          val loc = if (n + 1 < chainLen && n + 1 < 8) s"/r/${n + 1}"
            else s"/page/${(mix(seed, 18, h, n) % pagesPerHost).toInt}"
          // ~1/3 of hops carry an explicit response-header fixture with
          // MIXED-case keys (the engine must lowercase them — F9 applies to
          // hop headers too); the rest leave headers null and take the
          // synthesized location-only default
          val hdrs = if (mix(seed, 19, h, n) % 3 == 0)
            Map("Location" -> loc, "X-Redirect-By" -> s"synth-$h") else null
          Some(RedirectRow(s"https://${host(h)}/r/$n", loc,
            if (n % 2 == 0) 301 else 302, hdrs))
        } else None
      }
    }

    Graph(pages ++ subPages, robots, redirects,
      seeds = (0 until hosts).map(h => s"https://${host(h)}/"))
  }

  /** Long-chain graph for deep-crawl probes: each host is one straight
    * chain /c/0 → /c/1 → … → /c/(len−1), so BFS discovers exactly one new
    * url per host per round and the crawl runs `chainLen` rounds — the
    * round-COUNT stressor (compaction cadence, manifest/dir-listing growth,
    * per-round driver cost) with constant per-round work. Robots are 404
    * (allow-all) so every page fetches; no redirects. */
  def chainGraph(hosts: Int, chainLen: Int): Graph = {
    val pages = for { h <- 0 until hosts; i <- 0 until chainLen } yield {
      val next = if (i + 1 < chainLen) s"""<a href="/c/${i + 1}">n</a>""" else ""
      Page(s"https://${host(h)}/c/$i", new Timestamp(1600000000000L + i),
        s"<html><body>$next</body></html>".getBytes(java.nio.charset.StandardCharsets.UTF_8),
        s"chain $h/$i", "en")
    }
    Graph(pages, (0 until hosts).map(h => RobotsRow(host(h), 404, "")),
      Seq.empty, seeds = (0 until hosts).map(h => s"https://${host(h)}/c/0"))
  }

  def toDfs(spark: SparkSession, g: Graph): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    (g.pages.toDF(), g.robots.toDF(), g.redirects.toDF())
  }

  /** CLI: Synth <outDir> [hosts] [pagesPerHost] [seed] — writes the fixture
    * parquet dirs for CrawlJob/Bench runs. */
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val hosts = if (args.length > 1) args(1).toInt else 4
    val pagesPerHost = if (args.length > 2) args(2).toInt else 50
    val seed = if (args.length > 3) args(3).toLong else 42L
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graph(seed, hosts, pagesPerHost)
    write(spark, g, dir)
    println(s"""{"pages":${g.pages.size},"robots":${g.robots.size},"redirects":${g.redirects.size},"dir":"$dir"}""")
    spark.stop()
  }

  /** Write the fixture to parquet dirs (for bench runs that read from disk). */
  def write(spark: SparkSession, g: Graph, dir: String): Unit = {
    val (p, ro, re) = toDfs(spark, g)
    p.write.mode("overwrite").parquet(s"$dir/pages")
    ro.write.mode("overwrite").parquet(s"$dir/robots")
    re.write.mode("overwrite").parquet(s"$dir/redirects")
  }
}
