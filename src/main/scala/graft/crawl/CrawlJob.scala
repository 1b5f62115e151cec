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

  /** `roundSecs(i)` is the driver wall-time of the i-th round EXECUTED in
    * this invocation (not round number — a resume's first entry is its
    * first resumed round). Diagnostic only: the deep-crawl probe reads it
    * to evidence flat per-round cost at high round counts. */
  final case class JobResult(rounds: Int, results: DataFrame, metrics: DataFrame,
      roundSecs: Seq[Double] = Nil)

  /** The crawl task's id (reference: every response carries the task's
    * uuid, page_response.rs:20, minted per PUT /crawl). Batch analog: a
    * DETERMINISTIC name-based UUID over the task identity (seed list +
    * config), so replays and resumes of the same task agree on it while two
    * different tasks appended to one warehouse stay distinguishable. */
  def resolveRunId(seeds: Seq[String], cfg: CrawlConfig): String =
    if (cfg.runId.nonEmpty) cfg.runId
    else java.util.UUID.nameUUIDFromBytes(
      (seeds.sorted.mkString("\n") + "\u0000" + cfg.copy(runId = "").toString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

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
    val runId = resolveRunId(seeds, cfg)
    // static per-job tables, localCheckpointed (not just cached): the
    // redirect closure's logical plan is a maxRedirects-deep join/union
    // tree, and WITHOUT truncation every round's plan embeds it and pays
    // its Catalyst analysis again — checkpointing collapses it to a
    // LogicalRDD leaf once (resolveRedirects checkpoints internally so its
    // hop-table cache is released as soon as the closure materializes)
    val robotsCache = FrontierRound.buildRobotsCache(robots).localCheckpoint(true)
    val resolved = FrontierRound.resolveRedirects(spark, redirects, cfg)

    var round = 0
    var frontier: DataFrame = null
    var seen: DataFrame = null

    // the persistent loop's blooms are FILE-BACKED: the driver tracks only
    // the latest committed filter DIRECTORY (the filters themselves are
    // built and merged executor-side, one file per bucket — the driver
    // never materializes filter bytes; ~9 GB at the 10^10 design point)
    var bloomDir: Option[String] = None
    // cumulative seen count, maintained INCREMENTALLY (the cumulative seen
    // table is never rescanned for a metric) + the bloom capacity derived
    // from it (filters are rebuilt wider when the load crosses capacity)
    var seenTotal = 0L
    var bloomCap = cfg.bloomExpectedPerBucket
    // frontier cuckoo state (opt-in): like the blooms, the driver tracks
    // only the latest committed filter DIRECTORY — the per-bucket files are
    // written and delta-updated executor-side ([[FrontierFilter]])
    var cuckooDir: Option[String] = None
    var cuckooCap = cfg.cuckooExpectedPerBucket
    // the cuckoo gate: forced on by config, or auto-engaged when the
    // driver-known frontier count crosses the threshold (below it the
    // O(|delta|) update costs more than the exact join it accelerates).
    // Rows are identical either way — the probe only short-circuits.
    def cuckooOn(frontierN: Long): Boolean = cfg.useCuckooFrontier ||
      (cfg.cuckooAutoEnableAt > 0 && frontierN > cfg.cuckooAutoEnableAt)
    val cuckooConfigured = cfg.useCuckooFrontier || cfg.cuckooAutoEnableAt > 0

    val last = if (resume) io.lastCommittedRound() else -1
    if (last >= 0) {
      round = last + 1
      frontier = io.readFrontier(last)
      seen = io.readSeen(last).map(_.select("url")).getOrElse(emptySeen(spark))
      // the manifest carries the cumulative count — a resume must not pay a
      // full seen-table scan for a number the commit already knew (older
      // checkpoints without the field fall back to the one-time count)
      seenTotal = io.readManifest(last)
        .flatMap("\"seen_total\":(\\d+)".r.findFirstMatchIn(_))
        .map(_.group(1).toLong)
        .getOrElse(seen.count())
      if (cfg.useBloomSeen) {
        bloomCap = SeenFilter.sizedFor(cfg.bloomExpectedPerBucket,
          seenTotal / math.max(cfg.seenBuckets, 1))
        bloomDir = Some(io.bloomsDir(last)).filter(_ => io.hasBlooms(last))
        // exact-resume guard: a checkpoint written pre-bloom (or partially
        // restored) has seen rows but no bloom files — rebuild the filter
        // files from the seen table (distributed; no driver bytes). A
        // missing-file probe falls back to the exact join, so this guard is
        // an accelerator repair, never a correctness one.
        if (bloomDir.isEmpty && seenTotal > 0) {
          SeenFilter.writeMergedBlooms(seen.select("url"), cfg.seenBuckets,
            bloomCap, None, io.bloomsDir(last))
          bloomDir = Some(io.bloomsDir(last))
        }
      }
      // missing cuckoo files are only an accelerator gap: the first resumed
      // round runs the exact join, then the round-end write rebuilds them
      // from the full frontier (the cuckooDir.isEmpty branch below)
      if (cuckooConfigured) {
        cuckooDir = Some(io.cuckooDir(last)).filter(_ => io.hasCuckoo(last))
        // derive the resumed cap from the checkpointed files' actual width:
        // the pre-crash run may have GROWN past the config default, and a
        // reset cap would size new (previously-empty) buckets too small —
        // avoidable dead buckets until the next growth rebuild (ADVICE r5)
        cuckooDir.flatMap(FrontierFilter.resumedCap(_, spark))
          .foreach(c => cuckooCap = math.max(cuckooCap, c))
      }
    } else {
      frontier = seedFrontier(spark, seeds)
      seen = emptySeen(spark)
    }

    var frontierCount = frontier.count()
    val roundSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
    while (frontierCount > 0 && round < cfg.maxRounds) {
      val roundT0 = System.nanoTime()
      // broadcast payload: a path + bucket count + Hadoop conf, constant
      // size at any scale; bloomDir empty (fresh round 0) ⇒ seen is empty ⇒
      // the plain anti-join is already trivial, no probe needed
      val blooms = bloomDir.filter(_ => cfg.useBloomSeen).map(d =>
        SeenFilter.broadcastFileBlooms(spark, cfg.seenBuckets, d))
      // salted scheduling only when some host CAN exceed the threshold —
      // the driver-known frontier total gates it. The mega set stays a
      // DataFrame: the host-count aggregate rides the round plan as a
      // broadcast semi/anti split (no driver collect, no isin literal)
      val megaHosts =
        if (frontierCount > cfg.megaHostThreshold)
          Some(FrontierRound.findMegaHostsDf(frontier, cfg.megaHostThreshold))
        else None
      // frontier-membership probe (configured or auto-engaged): same
      // constant-size broadcast shape as the blooms — a directory path +
      // bucket count. cuckooDir is only ever non-empty when last round's
      // write gate was on, so the files always cover the round-start
      // frontier exactly.
      val cuckoo = cuckooDir.filter(_ => cuckooOn(frontierCount)).map(d =>
        FrontierFilter.broadcastFileCuckoos(spark, cfg.seenBuckets, d))
      val out = FrontierRound.run(spark, round, frontier, seen, pages, robotsCache, resolved, cfg, blooms, megaHosts, cuckoo)

      // persist first, commit manifest last (atomic) — exact-resume contract
      val stamped = FrontierRound.stampTimings(out.results, round, cfg)
        .withColumn("run_id", lit(runId))
      io.writeResults(round, stamped)
      if (cfg.exportJsonl)
        io.writeResultsJsonl(round, stamped,
          Some(FrontierRound.exportLinks(stamped, pages)))
      io.writeSeen(round, out.newSeen
        .withColumn("bucket", pmod(xxhash64(col("url")), lit(cfg.seenBuckets))))
      io.writeFrontier(round, out.newFrontier)

      // read checkpoints back: truncates lineage AND makes each round's
      // input immutable on disk (snapshot isolation per round)
      frontier = io.readFrontier(round)
      seen = io.readSeen(round).map(_.select("url")).getOrElse(emptySeen(spark))
      frontierCount = frontier.count()

      // this round's new-seen slice: counted once (the cumulative seen
      // table is NEVER rescanned for a metric) and folded into the blooms.
      // A round CAN produce zero new-seen rows (every scheduled url became
      // seen mid-round, e.g. as another url's redirect target) — TableIO
      // probes the bucket dirs through the Hadoop FS API (HDFS/object-store
      // safe) and returns None for an empty slice.
      val newSeenSlice = io.readSeenSlice(round).getOrElse(emptySeen(spark))
      seenTotal += newSeenSlice.count()
      if (cfg.useBloomSeen) {
        val cap = SeenFilter.sizedFor(cfg.bloomExpectedPerBucket,
          seenTotal / math.max(cfg.seenBuckets, 1))
        val dir = io.bloomsDir(round)
        if (cap > bloomCap) {
          // load crossed capacity: rebuild ALL filters wider from the full
          // seen table (amortized by doubling; merge needs equal widths)
          bloomCap = cap
          SeenFilter.writeMergedBlooms(seen.select("url"), cfg.seenBuckets,
            bloomCap, None, dir)
        } else {
          // incremental: this round's slice folded into the previous round's
          // files (merge + copy-forward, all executor-side / streamed)
          SeenFilter.writeMergedBlooms(newSeenSlice, cfg.seenBuckets,
            bloomCap, bloomDir, dir)
        }
        bloomDir = Some(dir)
      }
      if (cuckooConfigured && !cuckooOn(frontierCount)) {
        // gate off for the NEXT round (frontier below the auto threshold):
        // stop maintaining the filters and forget the inventory — a later
        // re-enable must rebuild from the then-current frontier, never
        // probe stale files (stale filters could return false negatives)
        cuckooDir = None
      } else if (cuckooOn(frontierCount)) {
        val cap = SeenFilter.sizedFor(cfg.cuckooExpectedPerBucket,
          frontierCount / math.max(cfg.seenBuckets, 1))
        val dir = io.cuckooDir(round)
        if (cuckooDir.isEmpty || cap > cuckooCap) {
          // fresh init / resume repair / the frontier outgrew capacity:
          // build all filters from the full frontier table (distributed,
          // no driver bytes; amortized by capacity doubling). `frontier`
          // is already the re-read post-round table, exactly the set the
          // delta path would have maintained.
          cuckooCap = math.max(cuckooCap, cap)
          FrontierFilter.writeFromUrls(frontier.select("url"), cfg.seenBuckets,
            cuckooCap, dir)
        } else {
          // incremental: O(|delta|), never a frontier scan — insert this
          // round's enqueued urls, delete its scheduled ones
          FrontierFilter.writeDeltas(out.entered, out.departed,
            cfg.seenBuckets, cuckooCap, cuckooDir.get, dir)
        }
        cuckooDir = Some(dir)
      }
      blooms.foreach(_.unpersist(false))
      cuckoo.foreach(_.unpersist(false))

      val results = spark.read.parquet(s"$stateDir/results/round=$round")
      val agg = results.agg(
        count(lit(1)).as("scheduled"),
        sum(when(col("crawl_status") === CrawlStatus.Fetched, 1L).otherwise(0L)).as("fetched"),
        sum(when(col("n_links") >= 0, col("n_links").cast("long")).otherwise(0L)).as("new_links"),
        // plain column aggregate — host is carried on every ResultRow from
        // the frontier entry; re-deriving it per row with a UDF is the
        // UDF-where-a-column-exists anti-pattern the north rule bans
        countDistinct(col("host")).as("hosts")
      ).collect()(0)
      val scheduledN = agg.getAs[Long]("scheduled")
      val fetchedN = Option(agg.getAs[Long]("fetched")).getOrElse(0L)
      val metricsDf = Seq(RoundMetrics(
        round, scheduledN, fetchedN, scheduledN - fetchedN,
        Option(agg.getAs[Long]("new_links")).getOrElse(0L),
        frontierCount, seenTotal, agg.getAs[Long]("hosts"))).toDF()
      out.unpersist()
      io.writeMetrics(round, metricsDf)
      io.commitRound(round,
        s"""{"round":$round,"scheduled":$scheduledN,"fetched":$fetchedN,"frontier":$frontierCount,"seen_total":$seenTotal}""")

      // periodic seen compaction — strictly AFTER the commit marker (only
      // committed rounds may be folded in; a crash mid-compaction must
      // leave a resumable layout). The live `seen` plan referenced the
      // now-deleted per-round dirs, so re-read it from the compacted snapshot.
      if (cfg.seenCompactEvery > 0 && (round + 1) % cfg.seenCompactEvery == 0) {
        io.compactSeen(round)
        seen = io.readSeen(round).map(_.select("url")).getOrElse(emptySeen(spark))
        // results/metrics are append-only: fold the tail rounds into one
        // committed range dir (bounds the small-files listing the same way
        // seen compaction does, without re-copying history)
        io.compactResults(round)
        io.compactMetrics(round)
        // frontier/bloom snapshots are superseded WHOLE each round (only
        // the latest committed round is ever read back) — GC the history
        // on the same cadence so their dir listings stay bounded too
        io.gcRoundDirsBelow("frontier", round)
        // filter tables are inventory-manifested: keep exactly the files the
        // live round's manifest references, sweep the rest
        io.gcFilterDirsBelow("blooms", round, ".bloom")
        io.gcFilterDirsBelow("cuckoo", round, ".cf")
        io.gcManifestsBelow(round)
      }

      roundSecs += (System.nanoTime() - roundT0) / 1e9
      round += 1
    }

    robotsCache.unpersist()
    resolved.unpersist()
    // zero rounds executed AND nothing committed earlier (fresh run with an
    // empty seed list): nothing was ever written, so the append-table reads
    // would throw. Return the empty-but-correctly-shaped tables instead —
    // same contract as [[runInMemory]]. A RESUME that finds no new work
    // still lands in the readers branch (round = lastCommitted + 1 > 0).
    if (round == 0) JobResult(0, emptyResults(spark), emptyMetrics(spark), Nil)
    else JobResult(round, io.readResults(), io.readMetrics(), roundSecs.toSeq)
  }

  /** Empty results table in the exact shape a populated run yields: the
    * [[ResultRow]] data columns with `round` moved LAST (both runners
    * attach `round` after the round tree — as the parquet partition column
    * or as the per-round literal — so it trails the data columns). */
  private def emptyResults(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = spark.emptyDataset[ResultRow].toDF()
    val dataCols = base.columns.filter(_ != "round").map(col)
    base.select(dataCols.toIndexedSeq :+ col("round").cast("int").as("round"): _*)
  }

  /** Empty metrics table in the exact shape a populated run yields: like
    * [[emptyResults]], `round` moves LAST as int (TableIO.writeMetrics drops
    * the data column; readAppendTable re-materializes it from the partition
    * dir, appended after the data columns). */
  private def emptyMetrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = spark.emptyDataset[RoundMetrics].toDF()
    val dataCols = base.columns.filter(_ != "round").map(col)
    base.select(dataCols.toIndexedSeq :+ col("round").cast("int").as("round"): _*)
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
    val dbgT = sys.env.contains("SPARK_GRAFT_DEBUG_TIMING")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbgT) {
      System.err.println(f"E2ESETUP $tag=${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    // localCheckpoint (not cache): collapse the static plans to LogicalRDD
    // leaves so the per-round Catalyst work doesn't grow with maxRedirects,
    // and embedded LocalRelation fixtures don't ride inside every plan
    // (resolveRedirects checkpoints internally).
    // coalesce(1) first: a LocalRelation fixture parallelizes ~one PARTITION
    // PER ROW, and the checkpointed leaf keeps that granularity — every one
    // of the loop's ~90 stages then dispatches ~30 one-row tasks (measured:
    // 1784 → 493 tasks per flagship run; wall-neutral on local[32], where
    // the one-row tasks dispatched in parallel anyway, but 3.6× less
    // scheduler traffic). The embedded loop is fixture-bounded by contract
    // (driver smoke query, tests, bench); the persistent loop keeps
    // parquet-native partitioning.
    val robotsCache = FrontierRound.buildRobotsCache(robots).coalesce(1).localCheckpoint(true)
    lap("robots_ckpt")
    val resolved = FrontierRound.resolveRedirects(spark, redirects, cfg)
    lap("redirect_closure")
    val pagesCk = pages.coalesce(1).localCheckpoint(true)
    lap("pages_ckpt")
    val runId = resolveRunId(seeds, cfg)
    var frontier = seedFrontier(spark, seeds).coalesce(1).persist()
    var seen = emptySeen(spark).persist()
    lap("seed_persist")
    // per-round result leaves, unioned ONCE after the loop: results are
    // never read mid-loop, and an incremental union would re-analyze an
    // O(round)-leaf plan every round (quadratic total Catalyst work)
    val resultRounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var bloomBytes: Map[Int, Array[Byte]] = Map.empty
    var frontierCount = frontier.count()
    lap("first_count")
    while (frontierCount > 0 && round < cfg.maxRounds) {
      val blooms =
        if (cfg.useBloomSeen)
          Some(SeenFilter.broadcastBlooms(spark, cfg.seenBuckets, bloomBytes))
        else None
      val megaHosts =
        if (frontierCount > cfg.megaHostThreshold)
          Some(FrontierRound.findMegaHostsDf(frontier, cfg.megaHostThreshold))
        else None
      val tb = System.nanoTime()
      val out = FrontierRound.run(spark, round, frontier, seen, pagesCk, robotsCache, resolved, cfg, blooms, megaHosts)
      val tr = System.nanoTime()
      // localCheckpoint (lazy) truncates the iterative lineage. Each lazy
      // checkpoint costs a full Catalyst optimize+codegen pass over the
      // round tree, so the round takes exactly ONE: results, next frontier
      // AND the new-seen delta all ride the same checkpoint as a tagged
      // union (missing columns null-filled), split back into leaves
      // afterwards. newSeen references the round tree's results subtree a
      // second time, but that subtree hangs off the round's persisted
      // intermediates, so execution pays a cache scan, not a re-join — and
      // folding it here removes the per-round second checkpoint pass plus
      // the separate three-leg counts plan the loop used to build (r4
      // verdict #3: the flagship's cost is per-round fixed driver work).
      // `round` is attached ABOVE the leaf: a changing literal inside the
      // (identically-shaped) round tree would bust the generated-code cache
      // and re-compile every stage every round.
      val unifiedPre = out.results.withColumn("__kind", lit("r"))
        .unionByName(out.newFrontier.withColumn("__kind", lit("f")),
          allowMissingColumns = true)
        .unionByName(FrontierRound.newSeenOf(out.results, seen)
          .withColumn("__kind", lit("s")), allowMissingColumns = true)
      val unified = unifiedPre.localCheckpoint(false)
      if (sys.env.contains("SPARK_GRAFT_DEBUG_TIMING"))
        System.err.println("E2EPHASES " + unifiedPre.queryExecution.tracker.phases
          .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }.mkString(" "))
      if (round == 1 && sys.env.contains("SPARK_GRAFT_DEBUG_PLAN"))
        System.err.println("E2EPLAN round=1\n" +
          unifiedPre.queryExecution.executedPlan.treeString)
      val resultCols = out.results.columns
      val frontierCols = out.newFrontier.columns
      val t0 = System.nanoTime()
      // the ONE action of the round: materializes the checkpoint and
      // returns all three leg counts
      val counts = unified.groupBy(col("__kind")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val tc1 = System.nanoTime()
      // round + absolute timings attach ABOVE the checkpoint leaf (changing
      // literals inside the round tree would bust the codegen cache)
      val newResults = FrontierRound.stampTimings(
        unified.filter(col("__kind") === "r").select(resultCols.map(col): _*),
        round, cfg).withColumn("run_id", lit(runId))
        .withColumn("round", lit(round))
      val newFrontier = unified.filter(col("__kind") === "f")
        .select(frontierCols.map(col): _*)
      val newSeenRows = unified.filter(col("__kind") === "s").select(col("url"))
      if (sys.env.contains("SPARK_GRAFT_DEBUG_TIMING"))
        System.err.println(f"E2EROUND round=$round build=${(tr - tb) / 1e9}%.2fs ckpt+action=${(tc1 - t0) / 1e9}%.2fs")
      out.unpersist()
      if (cfg.useBloomSeen) {
        bloomBytes = SeenFilter.merge(bloomBytes,
          SeenFilter.buildBlooms(newSeenRows.select("url"),
            cfg.seenBuckets, cfg.bloomExpectedPerBucket))
      }
      blooms.foreach(_.unpersist(false))
      frontier.unpersist(); seen.unpersist()
      // the seen union chain grows one plan node per round — collapse it to
      // a LogicalRDD leaf periodically so a deep in-memory run never pays
      // Catalyst analysis linear in rounds (one extra optimize pass per 8
      // rounds over a tiny table; the persistent loop truncates via
      // parquet). The checkpoint already stores the partitions, so no
      // .persist() on top — that would hold the rows twice.
      val grownSeen = seen.union(newSeenRows)
      seen = if ((round + 1) % 8 == 0) grownSeen.localCheckpoint(false)
             else grownSeen.persist()
      frontier = newFrontier
      resultRounds += newResults
      frontierCount = counts.getOrElse("f", 0L)
      round += 1
    }
    robotsCache.unpersist(); resolved.unpersist()
    // empty case carries the same schema as the non-empty one (ResultRow
    // columns + the per-round `round` literal appended by the loop)
    if (resultRounds.isEmpty) emptyResults(spark)
    else resultRounds.reduce(_ union _)
  }

  /** Canonical result ordering for parity checks: a contiguous global rank
    * over (round, depth, priority, url) — a total order (url is unique
    * within a round). Computed DISTRIBUTED: global range-partitioned sort
    * (Spark's orderBy) + per-partition zipWithIndex — never a
    * single-partition window (`WindowExec: No Partition Defined` is a
    * scale-killer on a real results table). */
  def orderedResults(results: DataFrame): DataFrame = {
    val spark = results.sparkSession
    val sorted = results.orderBy(col("round"), col("depth"), col("priority"), col("url"))
    val schema = org.apache.spark.sql.types.StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("schedule_rank", org.apache.spark.sql.types.LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  def main(args: Array[String]): Unit = {
    // spark-submit entry: CrawlJob <pagesDir> <robotsDir> <redirectsDir>
    //   <stateDir> <seedUrl>[,<seedUrl>...] [maxDepth] [hostQuota]
    //   [--resume] [--cuckoo]
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
    val Array(pagesDir, robotsDir, redirectsDir, stateDir, seedList, rest @ _*) = args
    val restArgs = rest.filterNot(_.startsWith("--"))
    val cfg = CrawlConfig(
      maxDepth = restArgs.headOption.map(_.toInt).getOrElse(16),
      hostQuotaPerRound = restArgs.drop(1).headOption.map(_.toInt).getOrElse(4),
      useCuckooFrontier = args.contains("--cuckoo"))
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
