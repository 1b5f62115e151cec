package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.model._
import graft.synth.Synth

/** End-to-end differential tests: the Spark engine vs the sequential
  * SimCrawler oracle on the same synthesized graph — final URL-seen set,
  * canonical crawl ordering, per-row statuses, byte-identical text, robots
  * compliance, and exact resume (FIXTURES.md §7; north_rule invariants). */
class CrawlE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
  private def hex(v: Vector[Int]): String =
    v.flatMap(i => Seq((i >>> 24) & 0xff, (i >>> 16) & 0xff, (i >>> 8) & 0xff, i & 0xff))
      .map(x => f"$x%02x").mkString

  private type Row = (Int, String, String, String, Int, String, String, Int, String, Int, Int, String)

  private def sparkRows(results: org.apache.spark.sql.DataFrame): Seq[Row] =
    results.collect().map { r =>
      (r.getAs[Int]("round"), r.getAs[String]("url"), r.getAs[String]("raw_url"),
        Option(r.getAs[String]("final_url")).orNull, r.getAs[Int]("http_code"),
        Option(r.getAs[String]("content_type")).orNull, r.getAs[String]("crawl_status"),
        r.getAs[Int]("depth"), hex(r.getAs[Array[Byte]]("priority")),
        r.getAs[Int]("n_redirects"), r.getAs[Int]("n_links"),
        Option(r.getAs[String]("text")).orNull)
    }.toSeq.sortBy(r => (r._1, r._8, r._9, r._2))

  private def simRows(results: Seq[SimCrawler.SimResult]): Seq[Row] =
    results.map { r =>
      (r.round, r.url, r.rawUrl, r.finalUrl.orNull, r.httpCode,
        r.contentType.orNull, r.status, r.depth, hex(r.priority),
        r.nRedirects, r.nLinks, r.text.orNull)
    }.sortBy(r => (r._1, r._8, r._9, r._2))

  private def runBoth(g: Synth.Graph, cfg: CrawlConfig, tag: String) = {
    val (pagesDf, robotsDf, redirectsDf) = Synth.toDfs(spark, g)
    val dir = java.nio.file.Files.createTempDirectory(s"crawl-$tag").toString
    val job = CrawlJob.run(spark, g.seeds, pagesDf, robotsDf, redirectsDf, cfg, dir)
    val sim = SimCrawler.run(g.pages, g.robots, g.redirects, g.seeds, cfg)
    (job, sim, dir)
  }

  test("seen set, statuses, ordering and text match the oracle (2 hosts, depth 3)") {
    val g = Synth.graph(seed = 42L, hosts = 2, pagesPerHost = 12)
    val cfg = CrawlConfig(maxDepth = 3, hostQuotaPerRound = 3)
    val (job, sim, dir) = runBoth(g, cfg, "small")

    val sRows = sparkRows(job.results)
    val oRows = simRows(sim.results)
    assert(sRows.size == oRows.size, s"row count: spark=${sRows.size} sim=${oRows.size}")
    sRows.zip(oRows).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i differs:\n spark=$a\n sim  =$b")
    }

    // final URL-seen set parity
    val io = new graft.io.TableIO(spark, dir)
    val sparkSeen = io.readSeen(job.rounds - 1).get
      .select("url").collect().map(_.getString(0)).toSet
    assert(sparkSeen == sim.seen)

    // byte-identical extracted text per url (north_rule invariant)
    val pageText = g.pages.map(p => p.url -> p.text).toMap
    val fetched = job.results
      .filter(col("crawl_status") === CrawlStatus.Fetched && col("text").isNotNull)
      .select("final_url", "text").collect()
    assert(fetched.nonEmpty)
    fetched.foreach { r =>
      assert(r.getString(1) == pageText(r.getString(0)),
        s"text mismatch for ${r.getString(0)}")
    }
  }

  test("larger graph with all status classes exercised (5 hosts)") {
    val g = Synth.graph(seed = 7L, hosts = 5, pagesPerHost = 15)
    val cfg = CrawlConfig(maxDepth = 4, hostQuotaPerRound = 2)
    val (results, sim) = runBothInMemory(g, cfg)
    val sRows = sparkRows(results)
    val oRows = simRows(sim.results)
    assert(sRows == oRows)
    // every status class appears (fixture designed to exercise them)
    val statuses = sRows.map(_._7).toSet
    assert(statuses.contains(CrawlStatus.Fetched))
    assert(statuses.contains(CrawlStatus.ConnectionError))
    assert(statuses.contains(CrawlStatus.RestrictedByRobotsTxt))
    assert(statuses.contains(CrawlStatus.MaximumCrawlDepthReached))
    // redirects followed somewhere
    assert(sRows.exists(_._10 > 0))
  }

  /** Checkpoint-free differential run for pure output-parity tests (the
    * resume/seen tests above still cover the TableIO path). */
  private def runBothInMemory(g: Synth.Graph, cfg: CrawlConfig) = {
    val (pagesDf, robotsDf, redirectsDf) = Synth.toDfs(spark, g)
    val results = CrawlJob.runInMemory(spark, g.seeds, pagesDf, robotsDf, redirectsDf, cfg)
    val sim = SimCrawler.run(g.pages, g.robots, g.redirects, g.seeds, cfg)
    (results, sim)
  }

  test("robots compliance: no fetch from a disallow_all host; rules enforced") {
    val g = Synth.graph(seed = 11L, hosts = 6, pagesPerHost = 10)
    val cfg = CrawlConfig(maxDepth = 3, hostQuotaPerRound = 4)
    val (results, _) = runBothInMemory(g, cfg)
    // host1.test has robots status 403 → disallow_all
    val host1Fetches = results.filter(
      col("crawl_status") === CrawlStatus.Fetched &&
        col("url").contains("host1.test")).count()
    assert(host1Fetches == 0, "disallow_all host must never be fetched")
    val host1Status = results.filter(col("url").contains("host1.test"))
      .select("crawl_status").distinct().collect().map(_.getString(0)).toSet
    assert(host1Status.subsetOf(Set(CrawlStatus.RestrictedByRobotsTxt)))
    // host0.test blocks /page/1* except /page/10$
    val blocked = results.filter(
      col("crawl_status") === CrawlStatus.Fetched &&
        col("url").rlike("host0\\.test/page/1[0-9]*$") &&
        !col("url").endsWith("/page/10")).count()
    assert(blocked == 0)
  }

  test("depth gate: children at maxDepth yield status rows, never fetches") {
    val g = Synth.graph(seed = 42L, hosts = 2, pagesPerHost = 12)
    val cfg = CrawlConfig(maxDepth = 2, hostQuotaPerRound = 8)
    val (results, sim) = runBothInMemory(g, cfg)
    assert(sparkRows(results) == simRows(sim.results))
    val overDepth = results.filter(col("depth") >= 2)
    assert(overDepth.filter(col("crawl_status") =!= CrawlStatus.MaximumCrawlDepthReached).count() == 0)
    assert(overDepth.count() > 0)
  }

  test("exact resume: interrupting after round 1 and resuming matches an uninterrupted run") {
    val g = Synth.graph(seed = 42L, hosts = 3, pagesPerHost = 10)
    val cfg = CrawlConfig(maxDepth = 3, hostQuotaPerRound = 2)
    val (pagesDf, robotsDf, redirectsDf) = Synth.toDfs(spark, g)

    val fullDir = java.nio.file.Files.createTempDirectory("crawl-full").toString
    val full = CrawlJob.run(spark, g.seeds, pagesDf, robotsDf, redirectsDf, cfg, fullDir)

    // interrupted: run with maxRounds=2, then resume from checkpoint
    val partDir = java.nio.file.Files.createTempDirectory("crawl-part").toString
    CrawlJob.run(spark, g.seeds, pagesDf, robotsDf, redirectsDf,
      cfg.copy(maxRounds = 2), partDir)
    val resumed = CrawlJob.run(spark, g.seeds, pagesDf, robotsDf, redirectsDf,
      cfg, partDir, resume = true)

    assert(resumed.rounds == full.rounds)
    assert(sparkRows(resumed.results) == sparkRows(full.results))
  }

  test("maxDepth=0 quirk: unlimited crawlability but only seeds enqueue children") {
    // reference: verify_crawlability passes everything when maximum_depth=0
    // (page_crawl_command.rs:73) but the consume gate `depth <= 0`
    // (page_loader_service.rs:142) only lets depth-0 pages enqueue
    val g = Synth.graph(seed = 42L, hosts = 2, pagesPerHost = 8)
    val cfg = CrawlConfig(maxDepth = 0, hostQuotaPerRound = 8)
    val (results, sim) = runBothInMemory(g, cfg)
    assert(sparkRows(results) == simRows(sim.results))
    assert(results.agg(max("depth")).collect()(0).getInt(0) <= 1)
  }
}
