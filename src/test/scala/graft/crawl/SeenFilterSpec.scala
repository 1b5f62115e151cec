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

  test("dynamic sizing keeps fpp bounded as the seen set grows 100×") {
    assert(SeenFilter.sizedFor(4096, 100) == 4096)
    assert(SeenFilter.sizedFor(4096, 4097) == 8192)
    assert(SeenFilter.sizedFor(4096, 409600) == 4096L * 128)
    // saturation evidence: 100× the design load at FIXED width → fpp ≈ 1,
    // silently degrading every candidate to the exact join; at the
    // sizedFor-derived width the fpp stays at the design level
    val base = 256L
    val urls = (0 until 25600).map(i => s"https://h.test/p/$i").toDF("url")
    val fixed = new SeenFilter.SeenBlooms(1, SeenFilter.buildBlooms(urls, 1, base))
    val grown = new SeenFilter.SeenBlooms(1,
      SeenFilter.buildBlooms(urls, 1, SeenFilter.sizedFor(base, 25600)))
    val probes = (0 until 5000).map(i => s"https://other.test/x/$i").toDF("url")
      .select(SeenFilter.bucketOf(col("url"), 1).as("b"), xxhash64(col("url")).as("h"))
      .as[(Long, Long)].collect()
    def fpp(b: SeenFilter.SeenBlooms): Double =
      probes.count { case (bk, h) => b.mightContain(bk.toInt, h) }.toDouble / probes.length
    assert(fpp(fixed) > 0.5, "fixed-width filter must be visibly saturated at 100× load")
    assert(fpp(grown) < 0.05, "sizedFor-width filter must hold the design fpp")
  }

  test("empty blooms pass everything straight through") {
    val cand = Seq("a", "b").toDF("url")
    val blooms = SeenFilter.broadcastBlooms(spark, 4, Map.empty)
    val out = SeenFilter.bloomAntiJoin(cand, spark.emptyDataset[String].toDF("url"), blooms)
    assert(out.count() == 2)
    blooms.destroy()
  }
}
