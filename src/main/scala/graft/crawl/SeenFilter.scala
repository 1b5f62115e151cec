package graft.crawl

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.util.sketch.BloomFilter
import graft.util.SerializableHadoopConf

/** The partitioned URL-seen Bloom filter (north_rule: "filters them through
  * a partitioned Bloom/cuckoo URL-seen filter"; SURVEY.md §2.4 J2 / §4).
  *
  * Design for 10^10 urls: the seen table is hash-bucketed by
  * `pmod(xxhash64(url), B)`. Per bucket, a Bloom filter over `xxhash64(url)`
  * is built DISTRIBUTED (map-side partial aggregation via Catalyst's
  * BloomFilterAggregate) and — on the persistent-loop scale path — written
  * straight from the aggregating task to one file per bucket under the
  * round's state dir ([[writeMergedBlooms]]). The DRIVER never holds filter
  * bytes: at ~0.9 bytes/url (3% fpp) the 10^10-URL seen set needs ~9 GB of
  * filter, past any driver heap or broadcast limit, so both the old
  * collect-to-a-map build and the whole-map broadcast are scale-killers
  * (r4 verdict). What ships to executors instead is a [[FileBlooms]]
  * handle — a path and a bucket count, a few hundred bytes — and each task
  * lazily loads only the bucket files it actually probes.
  *
  * Each round the anti-join against seen becomes:
  *
  *   1. probe: candidates whose (bucket, hash) the bloom rejects are
  *      DEFINITELY new — they skip the join entirely (the overwhelming
  *      majority on a growing crawl);
  *   2. exact: the few bloom-positives (true dups + fpp false positives)
  *      take the exact left-anti join against the seen table.
  *
  * No false negatives ⇒ result sets are bit-identical to the plain
  * anti-join (pinned by SeenFilterSpec). The probe takes the Spark-computed
  * `xxhash64` as an argument, so build and probe hash identically.
  *
  * The in-memory [[SeenBlooms]] map variant remains for the EMBEDDED loop
  * ([[CrawlJob.runInMemory]] — driver smoke query, tests, bench), whose
  * state is bounded by contract; the persistent loop at the 10^10 design
  * point always goes through [[FileBlooms]].
  */
object SeenFilter {

  /** Probe view over the per-bucket filters. Implementations must be
    * broadcast-safe; `mightContain` must have NO false negatives w.r.t.
    * the url set the filters were built over. Implemented here (Bloom,
    * in-memory and file-backed) and by [[FrontierFilter.FileCuckoos]]
    * (cuckoo — the deletable frontier-membership variant). */
  trait BloomProbe extends Serializable {
    def buckets: Int
    def mightContain(bucket: Int, hash: Long): Boolean
    /** File-backed probes want candidates co-partitioned by bucket first so
      * one task touches few buckets (bounds per-task filter memory). */
    def wantsBucketPartitioning: Boolean = false
  }

  /** Broadcast-map payload (EMBEDDED loop only): serialized per-bucket
    * filters + a lazily deserialized probe view (one decode per executor,
    * not per row). */
  final class SeenBlooms(val buckets: Int, val bytes: Map[Int, Array[Byte]])
      extends BloomProbe {
    @transient lazy val decoded: Map[Int, BloomFilter] = bytes.map { case (b, arr) =>
      b -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(arr))
    }
    def mightContain(bucket: Int, hash: Long): Boolean =
      decoded.get(bucket).exists(_.mightContainLong(hash))
  }

  /** File-backed probe handle (the persistent-loop scale path): only the
    * blooms DIRECTORY path, the bucket count and the Hadoop conf ship in the
    * broadcast — constant-size (~100 KB, all of it the conf) regardless of
    * seen-set size. Each
    * executor lazily loads `dir/bucket=B.bloom` for the buckets its tasks
    * actually probe, through a per-executor cache bounded at `maxCached`
    * filters (random single-entry eviction, same policy as the robots parse
    * cache). With candidates co-partitioned by bucket a task touches
    * ~⌈buckets/shuffle.partitions⌉ buckets, so the per-task budget is
    * maxCached × (total_filter_bytes / buckets) — at the 10^10 design point
    * (9 GB total, 4096 buckets ⇒ ~2.2 MB/bucket) a 64-entry cache is
    * ~140 MB/executor, trivially inside executor memory.
    *
    * A MISSING bucket file probes as maybe-seen (true): the row falls back
    * to the exact anti-join, which is correct both when the bucket is
    * genuinely empty (the build only writes populated buckets) and when a
    * file was lost — exactness never depends on the filter inventory. */
  final class FileBlooms(val dir: String, val buckets: Int,
      conf: SerializableHadoopConf, val maxCached: Int = 64) extends BloomProbe {
    override def wantsBucketPartitioning: Boolean = true

    // sentinel so a missing file is probed once per executor, not per row
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, AnyRef]()
    private object Missing extends Serializable

    // bucket → file map: the round's _inventory manifest (read once per
    // executor — untouched buckets reference files in EARLIER round dirs,
    // see [[FilterInventory]]), or the dir's own files for pre-inventory
    // layouts. A bucket absent from the map — or whose mapped file is gone
    // — probes maybe-seen (exact-join fallback), as before.
    @transient private lazy val inventory: Map[Int, String] =
      FilterInventory.resolve(dir, conf.value, ".bloom")

    private def load(bucket: Int): AnyRef =
      inventory.get(bucket) match {
        case None => Missing
        case Some(path) =>
          val p = new HPath(path)
          val fs = p.getFileSystem(conf.value)
          if (!fs.exists(p)) Missing
          else {
            val in = fs.open(p)
            try BloomFilter.readFrom(in) finally in.close()
          }
      }

    def mightContain(bucket: Int, hash: Long): Boolean = {
      var f = cache.get(bucket)
      if (f == null) {
        if (cache.size >= maxCached) graft.util.BoundedEvict.evictOne(cache)
        f = cache.computeIfAbsent(bucket, load _)
      }
      f match {
        case bf: BloomFilter => bf.mightContainLong(hash)
        case _ => true // missing file: fall back to the exact join
      }
    }
  }

  def bucketOf(url: Column, buckets: Int): Column =
    pmod(xxhash64(url), lit(buckets.toLong))

  /** Per-bucket bloom aggregation plan over a (url) DataFrame — the shared
    * build kernel (map-side partial sketches, one shuffle on bucket). */
  private def bloomAggPlan(urls: DataFrame, buckets: Int, expectedPerBucket: Long): DataFrame =
    urls.select(bucketOf(col("url"), buckets).as("bucket"), xxhash64(col("url")).as("h"))
      .groupBy(col("bucket"))
      .agg(ColumnShim.bloomAgg(col("h"), expectedPerBucket).as("bloom"))

  /** Distributed per-bucket bloom build COLLECTED TO THE DRIVER — embedded
    * loop only (bounded fixtures); the persistent loop must use
    * [[writeMergedBlooms]], which never materializes filter bytes on the
    * driver. */
  def buildBlooms(urls: DataFrame, buckets: Int, expectedPerBucket: Long): Map[Int, Array[Byte]] =
    bloomAggPlan(urls, buckets, expectedPerBucket)
      .collect()
      .map(r => r.getLong(0).toInt -> r.getAs[Array[Byte]]("bloom"))
      .toMap

  /** Build per-bucket filters over `urls` and write each bucket's serialized
    * filter straight FROM THE AGGREGATING TASK to `outDir/bucket=B.bloom`,
    * bloom-union-merged with the same bucket's previous filter (resolved
    * through `prevDir`'s inventory — the file may live in an earlier round's
    * dir) when present; widths must match — the caller keeps capacity a
    * deterministic function of cumulative load, see [[sizedFor]]. Buckets
    * with no new urls are NOT copied: `outDir/_inventory` references their
    * existing files where they are ([[FilterInventory]] — the r5-verdict #2
    * fix; the old copy-forward paid O(total filter bytes + buckets·RTT) per
    * round however small the delta). The driver handles bucket IDs and path
    * strings only — never filter bytes. Returns the touched-bucket count
    * (diagnostic). */
  def writeMergedBlooms(urls: DataFrame, buckets: Int, expectedPerBucket: Long,
      prevDir: Option[String], outDir: String): Int = {
    val spark = urls.sparkSession
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val out = new HPath(outDir)
    val fsDriver = out.getFileSystem(conf.value)
    if (!fsDriver.mkdirs(out))
      throw new java.io.IOException(s"mkdirs failed: $out")
    // bucket → live file of the previous round (inventory-resolved): tasks
    // merge from it, the new manifest carries the untouched entries forward
    val prevLive: Map[Int, String] =
      prevDir.map(FilterInventory.resolve(_, conf.value, ".bloom")).getOrElse(Map.empty)
    val touched: Array[Int] = bloomAggPlan(urls, buckets, expectedPerBucket)
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val bucket = r.getLong(0).toInt
          val bytes = r.getAs[Array[Byte]]("bloom")
          val filter = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          val dst = new HPath(outDir, s"bucket=$bucket.bloom")
          val fs = dst.getFileSystem(conf.value)
          prevLive.get(bucket).map(new HPath(_)).filter(fs.exists).foreach { pf =>
            val in = fs.open(pf)
            try filter.mergeInPlace(BloomFilter.readFrom(in)) finally in.close()
          }
          val os = fs.create(dst, true)
          try filter.writeTo(os) finally os.close()
          bucket
        }
      }.collect()
    val entries = (prevLive -- touched) ++
      touched.map(b => b -> new HPath(out, s"bucket=$b.bloom").toString)
    FilterInventory.write(outDir, conf.value, entries)
    touched.length
  }

  /** Union-merge two per-bucket filter maps (bloom union = bitwise or) —
    * embedded-loop companion of [[buildBlooms]]. */
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
      bytes: Map[Int, Array[Byte]]): Broadcast[BloomProbe] =
    spark.sparkContext.broadcast(new SeenBlooms(buckets, bytes): BloomProbe)

  /** Broadcast a file-backed probe handle: constant-size on the wire no
    * matter how large the seen set — the scale-path replacement for
    * [[broadcastBlooms]]. */
  def broadcastFileBlooms(spark: SparkSession, buckets: Int, dir: String,
      maxCached: Int = 64): Broadcast[BloomProbe] =
    spark.sparkContext.broadcast(new FileBlooms(dir, buckets,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration),
      maxCached): BloomProbe)

  /** Bloom-accelerated exact anti-join: rows of `candidates` whose url is
    * NOT in `seen`. `seen` must be exactly the url set the blooms were built
    * over (no false negatives ⇒ exactness). File-backed probes first
    * co-partition candidates by bucket, so each task lazily loads only its
    * own few bucket filters. */
  def bloomAntiJoin(candidates: DataFrame, seen: DataFrame,
      blooms: Broadcast[BloomProbe]): DataFrame = {
    val probeDet = udf((bucket: Long, h: Long) => blooms.value.mightContain(bucket.toInt, h))
    // File-backed probes MUST evaluate above the bucket exchange: a
    // deterministic filter gets pushed below the repartition onto the raw
    // scan partitions, where every task probes arbitrary buckets (unbounded
    // filter-file churn through the per-executor cache — exactly what the
    // co-partitioning exists to prevent). The probe IS pure; nondeterminism
    // here is the standard optimizer fence. Bonus: both union branches then
    // share one identical scan+Exchange subtree, which ReuseExchange dedups
    // — without the fence each branch rescans the input. The in-memory
    // probe keeps determinism so the cheap map-probe CAN push into the scan.
    val probe = if (blooms.value.wantsBucketPartitioning)
      probeDet.asNondeterministic() else probeDet
    val cand =
      if (blooms.value.wantsBucketPartitioning)
        candidates.repartition(bucketOf(col("url"), blooms.value.buckets))
      else candidates
    val marked = cand.withColumn("__maybe_seen",
      probe(bucketOf(col("url"), blooms.value.buckets), xxhash64(col("url"))))
    val definitelyNew = marked.filter(!col("__maybe_seen")).drop("__maybe_seen")
    val maybeSeen = marked.filter(col("__maybe_seen")).drop("__maybe_seen")
      .join(seen.select(col("url")), Seq("url"), "left_anti")
    definitelyNew.unionByName(maybeSeen)
  }
}
