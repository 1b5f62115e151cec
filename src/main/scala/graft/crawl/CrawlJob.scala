package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.TableIO
import graft.model._

/** The batch-iterative crawl driver (reference lifecycle: SURVEY.md §3.1 →
  * our §3.4 pipeline). Each round is one Dataset job; the driver loop is the
  * only sequential control. State (frontier / seen / results / metrics) is
  * checkpointed per round through [[TableIO]]; resume picks up from the last
  * committed manifest and produces output identical to an uninterrupted run.
  */
object CrawlJob {

  final case class JobResult(rounds: Int, results: DataFrame, metrics: DataFrame)

  /** Seed intake (reference: PUT /crawl, server/src/http.rs:24-29 — seed urls
    * enter the frontier RAW, not canonicalized, page_loader_service.rs:92). */
  def seedFrontier(spark: SparkSession, seeds: Seq[String]): DataFrame = {
    import spark.implicits._
    seeds.sorted.zipWithIndex.map { case (u, i) =>
      FrontierEntry(u, u,
        graft.canon.UrlCanon.hostOf(u).getOrElse(""),
        graft.canon.UrlCanon.protocolOf(u).getOrElse("https"),
        0, Priority.root(i))
    }.toDF()
  }

  private def emptySeen(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[String].toDF("url")
  }

  def run(
      spark: SparkSession,
      seeds: Seq[String],
      pages: DataFrame,
      robots: DataFrame,
      redirects: DataFrame,
      cfg: CrawlConfig,
      stateDir: String,
      resume: Boolean = false): JobResult = {
    import spark.implicits._

    val io = new TableIO(spark, stateDir)
    val robotsCache = FrontierRound.buildRobotsCache(robots).cache()
    val resolved = FrontierRound.resolveRedirects(spark, redirects, cfg).cache()

    var round = 0
    var frontier: DataFrame = null
    var seen: DataFrame = null

    var bloomBytes: Map[Int, Array[Byte]] = Map.empty

    val last = if (resume) io.lastCommittedRound() else -1
    if (last >= 0) {
      round = last + 1
      frontier = io.readFrontier(last)
      seen = io.readSeen(last).map(_.select("url")).getOrElse(emptySeen(spark))
      if (cfg.useBloomSeen) bloomBytes = io.readBlooms(last)
    } else {
      frontier = seedFrontier(spark, seeds)
      seen = emptySeen(spark)
    }

    var frontierCount = frontier.count()
    while (frontierCount > 0 && round < cfg.maxRounds) {
      val blooms =
        if (cfg.useBloomSeen)
          Some(SeenFilter.broadcastBlooms(spark, cfg.seenBuckets, bloomBytes))
        else None
      val out = FrontierRound.run(spark, round, frontier, seen, pages, robotsCache, resolved, cfg, blooms)

      // persist first, commit manifest last (atomic) — exact-resume contract
      io.writeResults(round, out.results)
      io.writeSeen(round, out.newSeen
        .withColumn("bucket", pmod(xxhash64(col("url")), lit(cfg.seenBuckets))))
      io.writeFrontier(round, out.newFrontier)

      // read checkpoints back: truncates lineage AND makes each round's
      // input immutable on disk (snapshot isolation per round)
      frontier = io.readFrontier(round)
      seen = io.readSeen(round).map(_.select("url")).getOrElse(emptySeen(spark))
      frontierCount = frontier.count()

      // fold this round's additions into the per-bucket blooms (distributed
      // build over just the new urls, driver-side union-merge) + checkpoint
      if (cfg.useBloomSeen) {
        val fresh = SeenFilter.buildBlooms(
          spark.read.option("basePath", s"$stateDir/seen")
            .parquet(s"$stateDir/seen/round=$round").select("url"),
          cfg.seenBuckets, cfg.bloomExpectedPerBucket)
        bloomBytes = SeenFilter.merge(bloomBytes, fresh)
        io.writeBlooms(round, bloomBytes)
      }
      blooms.foreach(_.unpersist(false))

      val results = spark.read.parquet(s"$stateDir/results/round=$round")
      val agg = results.agg(
        count(lit(1)).as("scheduled"),
        sum(when(col("crawl_status") === CrawlStatus.Fetched, 1L).otherwise(0L)).as("fetched"),
        sum(when(col("n_links") >= 0, col("n_links").cast("long")).otherwise(0L)).as("new_links"),
        countDistinct(FrontierRound.hostOfUdf(col("url"))).as("hosts")
      ).collect()(0)
      val scheduledN = agg.getAs[Long]("scheduled")
      val fetchedN = Option(agg.getAs[Long]("fetched")).getOrElse(0L)
      val metricsDf = Seq(RoundMetrics(
        round, scheduledN, fetchedN, scheduledN - fetchedN,
        Option(agg.getAs[Long]("new_links")).getOrElse(0L),
        frontierCount, seen.count(), agg.getAs[Long]("hosts"))).toDF()
      out.unpersist()
      io.writeMetrics(round, metricsDf)
      io.commitRound(round,
        s"""{"round":$round,"scheduled":$scheduledN,"fetched":$fetchedN,"frontier":$frontierCount}""")

      round += 1
    }

    robotsCache.unpersist()
    resolved.unpersist()
    JobResult(round, io.readResults(), io.readMetrics())
  }

  /** Checkpoint-free variant for embedded use (driver smoke query, tests,
    * bench): same round pipeline, state held as persisted Datasets instead of
    * parquet checkpoints. Returns the full results table. */
  def runInMemory(
      spark: SparkSession,
      seeds: Seq[String],
      pages: DataFrame,
      robots: DataFrame,
      redirects: DataFrame,
      cfg: CrawlConfig): DataFrame = {
    import spark.implicits._
    val robotsCache = FrontierRound.buildRobotsCache(robots).cache()
    val resolved = FrontierRound.resolveRedirects(spark, redirects, cfg).cache()
    var frontier = seedFrontier(spark, seeds).persist()
    var seen = emptySeen(spark).persist()
    var results: DataFrame = null
    var round = 0
    var bloomBytes: Map[Int, Array[Byte]] = Map.empty
    var frontierCount = frontier.count()
    while (frontierCount > 0 && round < cfg.maxRounds) {
      val blooms =
        if (cfg.useBloomSeen)
          Some(SeenFilter.broadcastBlooms(spark, cfg.seenBuckets, bloomBytes))
        else None
      val out = FrontierRound.run(spark, round, frontier, seen, pages, robotsCache, resolved, cfg, blooms)
      // localCheckpoint: truncate the iterative lineage each round
      val newResults = out.results.localCheckpoint(true)
      val newSeenRows = out.newSeen.localCheckpoint(true)
      val newFrontier = out.newFrontier.localCheckpoint(true)
      out.unpersist()
      if (cfg.useBloomSeen) {
        bloomBytes = SeenFilter.merge(bloomBytes,
          SeenFilter.buildBlooms(newSeenRows.select("url"),
            cfg.seenBuckets, cfg.bloomExpectedPerBucket))
      }
      blooms.foreach(_.unpersist(false))
      frontier.unpersist(); seen.unpersist()
      seen = seen.union(newSeenRows).persist()
      frontier = newFrontier
      results = if (results == null) newResults else results.union(newResults)
      frontierCount = frontier.count()
      round += 1
    }
    robotsCache.unpersist(); resolved.unpersist()
    if (results == null) spark.emptyDataset[ResultRow].toDF() else results
  }

  /** Canonical result ordering for parity checks: (round, depth, priority).
    * Materializing a contiguous global rank needs a single-partition window,
    * so it is done only here, on demand, never in the round hot path. */
  def orderedResults(results: DataFrame): DataFrame =
    results.withColumn("schedule_rank",
      row_number().over(Window.orderBy(col("round"), col("depth"), col("priority"), col("url"))))

  def main(args: Array[String]): Unit = {
    // spark-submit entry: CrawlJob <pagesDir> <robotsDir> <redirectsDir>
    //   <stateDir> <seedUrl>[,<seedUrl>...] [maxDepth] [hostQuota] [--resume]
    val spark = SparkSession.builder()
      .appName("graft-crawl")
      // spark-submit injects the real master; default for local sbt runs
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val Array(pagesDir, robotsDir, redirectsDir, stateDir, seedList, restArgs @ _*) = args
    val cfg = CrawlConfig(
      maxDepth = restArgs.headOption.map(_.toInt).getOrElse(16),
      hostQuotaPerRound = restArgs.drop(1).headOption.map(_.toInt).getOrElse(4))
    val res = run(spark,
      seedList.split(",").toSeq,
      spark.read.parquet(pagesDir),
      spark.read.parquet(robotsDir),
      spark.read.parquet(redirectsDir),
      cfg, stateDir, resume = args.contains("--resume"))
    println(s"""{"rounds":${res.rounds},"results":${res.results.count()}}""")
    spark.stop()
  }
}
