package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: times the q_crawl_e2e flagship in isolation (per-round
  * action times via SPARK_GRAFT_DEBUG_TIMING). Not part of the driver
  * contract — a tuning tool. */
object E2EProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = queries.Queries.crawlE2E(spark,
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
      System.err.println(f"E2ETOTAL pass=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
