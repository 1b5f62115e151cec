package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.crawl.FrontierRound
import graft.model.CrawlConfig

/** Diagnostic main for the scaling protocol: times each stage of the
  * schedule+dedup round separately at two parallelism levels so the
  * bottleneck (canon UDF vs anti-join shuffle vs politeness windows) is
  * visible. Not part of the driver contract — a tuning tool for
  * BASELINE.md's measurement protocol. */
object ScaleProbe {

  def stageTimes(spark: SparkSession, dir: String): Map[String, Double] = {
    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val frontier = spark.read.parquet(s"$dir/frontier")
    val seen = spark.read.parquet(s"$dir/seen")
    val canon = frontier.select(
      FrontierRound.canonUdf(lit("https"), col("raw_uri"), col("host"),
        concat(lit("https://"), col("host"), lit("/"))).as("url"),
      col("host"), col("depth"),
      FrontierRound.prioChildUdf(lit(Array.emptyByteArray), col("rank")).as("priority"))
    val tScan = timed(frontier.select(count(lit(1))).collect())
    val tCanon = timed(canon.select(count(col("url"))).collect())
    val fresh = canon.join(seen, Seq("url"), "left_anti")
    val tAnti = timed(fresh.select(count(lit(1))).collect())
    val cfg = CrawlConfig(hostQuotaPerRound = 8, saltBuckets = 64)
    val mega = FrontierRound.findMegaHostsDf(frontier, cfg.megaHostThreshold)
    val flagged = FrontierRound.scheduleFlagged(fresh, cfg, mega)
    val tFull = timed(flagged.agg(count(lit(1)),
      sum(when(col("is_scheduled"), 1L).otherwise(0L))).collect())
    Map("scan" -> tScan, "canon" -> tCanon, "anti" -> tAnti, "full" -> tFull)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_bench"
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "2").toInt
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/frontier"))) {
      val fN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "4000000").toLong
      Bench.withSession(16)(s => Bench.writeScalingInput(s, dir, fN, hosts = 20000))
    }
    val jar = Bench.ensureJar()
    val coresPerExec = sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "1").toInt
    Seq(n, n * 4).foreach { units =>
      val times =
        if (sys.env.contains("SPARK_GRAFT_THREAD_SCALING") || jar.isEmpty)
          Bench.withScalingSession(units * coresPerExec) { s => stageTimes(s, dir); stageTimes(s, dir) }
        else
          Bench.withExecutorSession(units, coresPerExec, jar.get) { s =>
            stageTimes(s, dir); stageTimes(s, dir)
          }
      println(f"SCALEPROBE units=$units " + times.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.2fs" }.mkString(" "))
    }
  }
}
