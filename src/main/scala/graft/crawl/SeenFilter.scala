package graft.crawl

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.util.sketch.BloomFilter

/** The partitioned URL-seen Bloom filter (north_rule: "filters them through
  * a partitioned Bloom/cuckoo URL-seen filter"; SURVEY.md §2.4 J2 / §4).
  *
  * Design for 10^10 urls: the seen table is hash-bucketed by
  * `pmod(xxhash64(url), B)`. Per bucket, a Bloom filter over `xxhash64(url)`
  * is built DISTRIBUTED (map-side partial aggregation via Catalyst's
  * BloomFilterAggregate), collected as (bucket → serialized filter bytes) —
  * a few MB total — persisted with the round checkpoint, and broadcast.
  * Each round the anti-join against seen becomes:
  *
  *   1. probe: candidates whose (bucket, hash) the bloom rejects are
  *      DEFINITELY new — they skip the join entirely (the overwhelming
  *      majority on a growing crawl);
  *   2. exact: the few bloom-positives (true dups + fpp false positives)
  *      take the exact left-anti join against the seen table.
  *
  * No false negatives ⇒ result sets are bit-identical to the plain
  * anti-join (pinned by SeenFilterSpec). The probe UDF takes the
  * Spark-computed `xxhash64` as an argument, so build and probe hash
  * identically; executors deserialize each bucket's filter once (lazy).
  */
object SeenFilter {

  /** Broadcast payload: serialized per-bucket filters + a lazily
    * deserialized probe view (one decode per executor, not per row). */
  final class SeenBlooms(val buckets: Int, val bytes: Map[Int, Array[Byte]])
      extends Serializable {
    @transient lazy val decoded: Map[Int, BloomFilter] = bytes.map { case (b, arr) =>
      b -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(arr))
    }
    def mightContain(bucket: Int, hash: Long): Boolean =
      decoded.get(bucket).exists(_.mightContainLong(hash))
  }

  def bucketOf(url: Column, buckets: Int): Column =
    pmod(xxhash64(url), lit(buckets.toLong))

  /** Distributed per-bucket bloom build over a (url) DataFrame. */
  def buildBlooms(urls: DataFrame, buckets: Int, expectedPerBucket: Long): Map[Int, Array[Byte]] =
    urls.select(bucketOf(col("url"), buckets).as("bucket"), xxhash64(col("url")).as("h"))
      .groupBy(col("bucket"))
      .agg(ColumnShim.bloomAgg(col("h"), expectedPerBucket).as("bloom"))
      .collect()
      .map(r => r.getLong(0).toInt -> r.getAs[Array[Byte]]("bloom"))
      .toMap

  /** Union-merge two per-bucket filter maps (bloom union = bitwise or). */
  def merge(a: Map[Int, Array[Byte]], b: Map[Int, Array[Byte]]): Map[Int, Array[Byte]] = {
    val out = scala.collection.mutable.Map[Int, Array[Byte]](a.toSeq: _*)
    b.foreach { case (bucket, arr) =>
      out.get(bucket) match {
        case None => out(bucket) = arr
        case Some(prev) =>
          val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(prev))
          f.mergeInPlace(BloomFilter.readFrom(new java.io.ByteArrayInputStream(arr)))
          val bos = new java.io.ByteArrayOutputStream()
          f.writeTo(bos)
          out(bucket) = bos.toByteArray
      }
    }
    out.toMap
  }

  /** Per-bucket capacity the filters must be sized for at cumulative load
    * `perBucketLoad`: the base capacity doubled until it covers the load.
    * Keeping capacity a deterministic function of the load lets resume
    * re-derive the bit width of checkpointed filters (merge requires equal
    * widths) without a manifest field, and keeps the false-positive rate
    * bounded as the seen set grows — a fixed-width filter saturates
    * (fpp → 1) and silently degrades the anti-join to the exact path. */
  def sizedFor(base: Long, perBucketLoad: Long): Long = {
    var cap = math.max(base, 1L)
    while (perBucketLoad > cap) cap *= 2
    cap
  }

  def broadcastBlooms(spark: SparkSession, buckets: Int,
      bytes: Map[Int, Array[Byte]]): Broadcast[SeenBlooms] =
    spark.sparkContext.broadcast(new SeenBlooms(buckets, bytes))

  /** Bloom-accelerated exact anti-join: rows of `candidates` whose url is
    * NOT in `seen`. `seen` must be exactly the url set the blooms were built
    * over (no false negatives ⇒ exactness). */
  def bloomAntiJoin(candidates: DataFrame, seen: DataFrame,
      blooms: Broadcast[SeenFilter.SeenBlooms]): DataFrame = {
    val probe = udf((bucket: Long, h: Long) => blooms.value.mightContain(bucket.toInt, h))
    val marked = candidates.withColumn("__maybe_seen",
      probe(bucketOf(col("url"), blooms.value.buckets), xxhash64(col("url"))))
    val definitelyNew = marked.filter(!col("__maybe_seen")).drop("__maybe_seen")
    val maybeSeen = marked.filter(col("__maybe_seen")).drop("__maybe_seen")
      .join(seen.select(col("url")), Seq("url"), "left_anti")
    definitelyNew.unionByName(maybeSeen)
  }
}
