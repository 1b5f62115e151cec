package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SeenFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("bloom anti-join is exactly the plain anti-join (no false negatives)") {
    val seen = (0 until 3000).map(i => s"https://h${i % 7}.test/p/$i").toDF("url")
    val candidates = (1500 until 4500).map(i => s"https://h${i % 7}.test/p/$i")
      .toDF("url").withColumn("depth", lit(1))
    val blooms = SeenFilter.broadcastBlooms(spark, 16,
      SeenFilter.buildBlooms(seen, 16, 1024))
    val withBloom = SeenFilter.bloomAntiJoin(candidates, seen, blooms)
      .select("url").as[String].collect().sorted
    val plain = candidates.join(seen, Seq("url"), "left_anti")
      .select("url").as[String].collect().sorted
    assert(withBloom.toSeq == plain.toSeq)
    assert(plain.length == 1500)
    blooms.destroy()
  }

  test("merge unions filters: everything inserted in either is might-contained") {
    val a = (0 until 500).map(i => s"u$i").toDF("url")
    val b = (400 until 900).map(i => s"u$i").toDF("url")
    val merged = SeenFilter.merge(
      SeenFilter.buildBlooms(a, 4, 512), SeenFilter.buildBlooms(b, 4, 512))
    val blooms = new SeenFilter.SeenBlooms(4, merged)
    val probe = (0 until 900).map(i => s"u$i").toDF("url")
      .select(SeenFilter.bucketOf(col("url"), 4).as("bucket"),
        xxhash64(col("url")).as("h"))
      .as[(Long, Long)].collect()
    probe.foreach { case (bkt, h) => assert(blooms.mightContain(bkt.toInt, h)) }
  }

  test("empty blooms pass everything straight through") {
    val cand = Seq("a", "b").toDF("url")
    val blooms = SeenFilter.broadcastBlooms(spark, 4, Map.empty)
    val out = SeenFilter.bloomAntiJoin(cand, spark.emptyDataset[String].toDF("url"), blooms)
    assert(out.count() == 2)
    blooms.destroy()
  }
}
