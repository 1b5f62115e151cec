package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-6 tuning harness (NOT part of the driver contract — Bench.scala is
  * the frozen measurement surface). Times each declared query in isolation
  * with the noop sink under the exact session shape Bench part 1 uses, and
  * optionally dumps `explain("formatted")` per query for the plan evidence
  * in plans/r06/.
  *
  * Env:
  *  - SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *  - SPARK_GRAFT_ONLY     comma list restricting the query set
  *  - SPARK_GRAFT_REPS     reps per query (default 3; best-of reported)
  *  - SPARK_GRAFT_PLAN_DIR if set, write <dir>/<query>_<SUFFIX>.txt plans
  *  - SPARK_GRAFT_PLAN_SUFFIX  suffix for plan files (default "before")
  *  - SPARK_GRAFT_SKIP_TIME    if set, only dump plans (no timed reps)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val skipTime = sys.env.contains("SPARK_GRAFT_SKIP_TIME")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same warm-up as Bench part 1
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1000).collect()

    val names = (Bench.headline ++
      SparkEntry.queries.keys.filterNot(Bench.headline.contains).toSeq.sorted)
      .filter(n => only.forall(_.contains(n)))

    planDir.foreach(d => Files.createDirectories(Paths.get(d)))
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      planDir.foreach { d =>
        // plan dump: build the frame once, no execution beyond what the
        // query fn itself runs (crawl_e2e executes its loop on build)
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(d, s"${name}_$planSuffix.txt"), txt)
      }
      val times = if (skipTime) Nil else (1 to reps).map { _ =>
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (times.nonEmpty)
        System.err.println(f"BENCHX $name%-24s best=${times.min}%7.3f raw=" +
          times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      name -> times
    }
    if (!skipTime) {
      val total = results.collect { case (n, ts) if Bench.headline.contains(n) && ts.nonEmpty => ts.min }.sum
      System.err.println(f"BENCHX_TOTAL headline_best_sum=$total%.3f")
    }
    if (sys.env.contains("SPARK_GRAFT_RULE_TIMING"))
      System.err.println(
        org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
