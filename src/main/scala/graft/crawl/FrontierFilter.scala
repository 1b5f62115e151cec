package graft.crawl

import org.apache.hadoop.fs.{FileUtil, Path => HPath}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.SerializableHadoopConf

/** The partitioned frontier-membership cuckoo filter (north_rule:
  * "a partitioned Bloom/cuckoo URL-seen filter" — the cuckoo half).
  *
  * Accelerates the enqueue-time gate "is this extracted link already queued?"
  * (SURVEY §2.4 F3/J1): kids the filter rejects are DEFINITELY not in the
  * still-queued frontier and skip the exact anti-join against it — the
  * overwhelming majority once the crawl widens. Same two-lane mechanism as
  * the seen-Bloom ([[SeenFilter.bloomAntiJoin]], reused verbatim via the
  * [[SeenFilter.BloomProbe]] trait), same file-backed shipping (the
  * broadcast is a directory path + bucket count, constant-size at any
  * frontier scale; executors lazily load only the bucket files their tasks
  * probe).
  *
  * Why cuckoo and not a second Bloom: the frontier is NOT monotone — every
  * scheduled url LEAVES it. A Bloom can only grow, so mirroring the frontier
  * would mean a full O(|frontier|) rebuild every round (a 10^10-row scan at
  * the design point). Cuckoo filters delete, so each round's update is
  * O(|delta|): insert the newly enqueued urls, delete the scheduled ones
  * ([[writeDeltas]]), touching only the outer buckets the delta hashes into.
  *
  * Exactness contract (identical to the seen-Bloom's): the probe covers the
  * frontier AT ROUND START, a superset of the still-queued `deferred` set
  * the gate joins against, and cuckoo filters have no false negatives over
  * inserted-minus-deleted items — so filter-rejected kids are truly absent
  * and probe-positives take the exact anti-join. A bucket whose filter
  * SATURATED (insert failure — see [[CuckooFilter]]'s saturation contract)
  * is marked with a `.dead` file and its `.cf` file removed; missing files
  * probe all-true, degrading that bucket to the exact join, never to a wrong
  * answer. The delete-safety precondition (deletes ⊆ live inserts) holds by
  * construction: departed urls are exactly the scheduled slice of the
  * frontier, every member of which was inserted when it was enqueued (or at
  * the init build).
  *
  * Budget at the 10^10-url design point: the frontier is the CRAWLABLE
  * HORIZON, typically 1–2 orders below the cumulative seen set — at 10^9
  * queued urls and 4096 outer buckets, ~2.4 bytes/url ⇒ ~0.6 MB per bucket
  * file, 64-entry executor cache ≈ 38 MB. The per-round update writes only
  * touched buckets and stream-copies the rest forward, all executor-side —
  * the driver handles bucket IDS only, never filter bytes.
  */
object FrontierFilter {

  /** File-backed probe over per-bucket cuckoo files — the frontier twin of
    * [[SeenFilter.FileBlooms]] (same executor-side bounded cache, same
    * missing-file = probe-true fallback, same bucket co-partitioning
    * request). */
  final class FileCuckoos(val dir: String, val buckets: Int,
      conf: SerializableHadoopConf, val maxCached: Int = 64)
      extends SeenFilter.BloomProbe {
    override def wantsBucketPartitioning: Boolean = true

    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, AnyRef]()
    private object Missing extends Serializable

    private def load(bucket: Int): AnyRef = {
      val p = new HPath(dir, s"bucket=$bucket.cf")
      val fs = p.getFileSystem(conf.value)
      if (!fs.exists(p)) Missing
      else {
        val in = fs.open(p)
        try CuckooFilter.readFrom(in) finally in.close()
      }
    }

    def mightContain(bucket: Int, hash: Long): Boolean = {
      var f = cache.get(bucket)
      if (f == null) {
        if (cache.size >= maxCached) graft.util.BoundedEvict.evictOne(cache)
        f = cache.computeIfAbsent(bucket, load _)
      }
      f match {
        case cf: CuckooFilter => cf.mightContain(hash)
        case _ => true // missing or dead bucket: exact-join fallback
      }
    }
  }

  private def filterPath(dir: String, bucket: Int) = new HPath(dir, s"bucket=$bucket.cf")
  private def deadPath(dir: String, bucket: Int) = new HPath(dir, s"bucket=$bucket.dead")

  /** Hashed-and-bucketed view: (bucket, h) in the same bucket space as the
    * seen table ([[SeenFilter.bucketOf]]) so one `repartition(bucket)`
    * co-locates each outer bucket's whole delta in one task. */
  private def hashed(urls: DataFrame, buckets: Int): DataFrame =
    urls.select(SeenFilter.bucketOf(col("url"), buckets).as("bucket"),
      xxhash64(col("url")).as("h"))

  /** Build per-bucket cuckoo files from the FULL url set — fresh init,
    * resume repair, and capacity-growth rebuild. One shuffle on bucket;
    * each file is written from the task that sorted its bucket; the driver
    * collects touched bucket ids (ints), never filter bytes. Returns the
    * touched-bucket count. */
  def writeFromUrls(urls: DataFrame, buckets: Int, expectedPerBucket: Long,
      outDir: String): Int = {
    val spark = urls.sparkSession
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    mkdirsOrThrow(spark, outDir)
    val touched = hashed(urls, buckets)
      .repartition(col("bucket")).sortWithinPartitions(col("bucket"))
      .rdd.mapPartitions { rows =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var cur = -1L
        var filter: CuckooFilter = null
        var dead = false
        def flush(): Unit = if (cur >= 0) {
          writeBucket(outDir, cur.toInt, if (dead) None else Some(filter), conf)
          out += cur.toInt
        }
        rows.foreach { r =>
          val b = r.getLong(0)
          if (b != cur) {
            flush()
            cur = b
            filter = CuckooFilter.create(expectedPerBucket)
            dead = false
          }
          if (!dead && !filter.insert(r.getLong(1))) dead = true
        }
        flush()
        out.iterator
      }.collect()
    touched.length
  }

  /** Apply one round's frontier delta to the previous round's filter files:
    * per touched bucket, load `prevDir`'s filter (or create one sized
    * `expectedPerBucket` for a bucket that was empty), DELETE the departed
    * hashes first (freeing slots), then insert the entered ones, and write
    * the result under `outDir`. A bucket already `.dead` in `prevDir` stays
    * dead (its lost memberships are unrecoverable from deltas); a bucket
    * that saturates HERE goes dead. Untouched buckets are stream-copied
    * forward so `outDir` always holds the complete filter inventory.
    * O(|inserts| + |deletes|) — never a frontier scan. Returns the
    * touched-bucket count. */
  def writeDeltas(inserts: DataFrame, deletes: DataFrame, buckets: Int,
      expectedPerBucket: Long, prevDir: String, outDir: String): Int = {
    val spark = inserts.sparkSession
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    mkdirsOrThrow(spark, outDir)
    // op 0 = delete, 1 = insert; the within-bucket sort runs deletes first
    val tagged = hashed(deletes, buckets).withColumn("op", lit(0))
      .unionByName(hashed(inserts, buckets).withColumn("op", lit(1)))
    val touched: Array[Int] = tagged
      .repartition(col("bucket")).sortWithinPartitions(col("bucket"), col("op"))
      .rdd.mapPartitions { rows =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        var cur = -1L
        var filter: CuckooFilter = null
        var dead = false
        def open(bucket: Int): Unit = {
          val prevDead = deadPath(prevDir, bucket)
          val prevFile = filterPath(prevDir, bucket)
          val fs = prevFile.getFileSystem(conf.value)
          if (fs.exists(prevDead)) { dead = true; filter = null }
          else if (fs.exists(prevFile)) {
            dead = false
            val in = fs.open(prevFile)
            try filter = CuckooFilter.readFrom(in) finally in.close()
          } else {
            dead = false
            filter = CuckooFilter.create(expectedPerBucket)
          }
        }
        def flush(): Unit = if (cur >= 0) {
          writeBucket(outDir, cur.toInt, if (dead) None else Some(filter), conf)
          out += cur.toInt
        }
        rows.foreach { r =>
          val b = r.getLong(0)
          if (b != cur) { flush(); cur = b; open(b.toInt) }
          if (!dead) {
            if (r.getInt(2) == 0) filter.delete(r.getLong(1))
            else if (!filter.insert(r.getLong(1))) dead = true
          }
        }
        flush()
        out.iterator
      }.collect()
    // carry forward every bucket this delta never touched (.cf and .dead
    // alike) — streamed one file at a time, the driver buffers an IO chunk
    val fsDriver = new HPath(prevDir).getFileSystem(conf.value)
    val prev = new HPath(prevDir)
    if (fsDriver.exists(prev)) {
      val touchedSet = touched.toSet
      val rx = "bucket=(\\d+)\\.(cf|dead)".r
      fsDriver.listStatus(prev).foreach { st =>
        st.getPath.getName match {
          case rx(b, _) if !touchedSet.contains(b.toInt) =>
            FileUtil.copy(fsDriver, st.getPath, fsDriver,
              new HPath(outDir, st.getPath.getName), false, true, conf.value)
          case _ =>
        }
      }
    }
    touched.length
  }

  /** Some(filter) ⇒ write `bucket=B.cf`; None ⇒ the bucket is dead, write
    * the `.dead` marker instead (probe-true / exact-join fallback, and the
    * next delta writer knows not to resurrect it from a partial delta). */
  private def writeBucket(dir: String, bucket: Int, filter: Option[CuckooFilter],
      conf: SerializableHadoopConf): Unit = {
    filter match {
      case Some(f) =>
        val dst = filterPath(dir, bucket)
        val fs = dst.getFileSystem(conf.value)
        val os = fs.create(dst, true)
        try f.writeTo(os) finally os.close()
      case None =>
        val dst = deadPath(dir, bucket)
        val fs = dst.getFileSystem(conf.value)
        fs.create(dst, true).close()
    }
  }

  private def mkdirsOrThrow(spark: SparkSession, dir: String): Unit = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.mkdirs(p)) throw new java.io.IOException(s"mkdirs failed: $p")
  }

  /** Broadcast a file-backed frontier probe: constant-size on the wire no
    * matter how large the frontier. */
  def broadcastFileCuckoos(spark: SparkSession, buckets: Int, dir: String,
      maxCached: Int = 64): Broadcast[SeenFilter.BloomProbe] =
    spark.sparkContext.broadcast(new FileCuckoos(dir, buckets,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration),
      maxCached): SeenFilter.BloomProbe)
}
