package graft.io

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}

/** Iceberg-shaped table/checkpoint seam over Parquet (SURVEY.md §7.1.5).
  *
  * The sandbox ships no Iceberg jars, so this implements the contract the
  * north rule needs from Iceberg — snapshot-per-round isolation, partition
  * layout on url-host hash buckets, exact resume, periodic compaction —
  * with plain Parquet dirs plus an atomically-renamed per-round JSON
  * manifest. A real Iceberg catalog can replace this seam without touching
  * the engine. All filesystem access goes through the Hadoop FileSystem
  * API, so `root` may be local, HDFS or an object store.
  *
  * Layout under `root`:
  * {{{
  *   results/round=N/   part-*.parquet      (append-only, one dir per round)
  *   seen/round=N/      bucket=B/part-*.parquet (append-only per round)
  *   seen_compacted/upto=N/ bucket=B/...    (all rounds ≤ N in one dir;
  *                                           committed iff its Spark
  *                                           _SUCCESS marker exists)
  *   frontier/round=N/  part-*.parquet      (full snapshot per round)
  *   metrics/round=N/   part-*.parquet
  *   manifest/round=N.json                  (commit marker, written LAST)
  * }}}
  * A round is committed iff its manifest exists; resume reads the highest
  * committed round and ignores any torn later writes (reference has no
  * resume at all — in-memory state dies with the process,
  * task_context.rs:63-66; checkpointing is the north_rule addition).
  */
final class TableIO(spark: SparkSession, root: String) {

  private def p(parts: String*): String = (Seq(root) ++ parts).mkString("/")
  private def hp(parts: String*): HPath = new HPath(p(parts: _*))
  private val fs: FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write small bytes to `dir/name` atomically: temp file + rename.
    * Hadoop FS ops report many failures as `false` instead of throwing —
    * every boolean is checked so a failed marker write can never be
    * mistaken for a commit. */
  private def atomicWrite(dir: HPath, name: String, bytes: Array[Byte]): Unit = {
    if (!fs.mkdirs(dir))
      throw new java.io.IOException(s"mkdirs failed: $dir")
    val tmp = new HPath(dir, s"$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val dst = new HPath(dir, name)
    if (fs.exists(dst) && !fs.delete(dst, false))
      throw new java.io.IOException(s"delete failed: $dst")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename failed: $tmp -> $dst")
  }

  private def readBytes(f: HPath): Array[Byte] = {
    val in = fs.open(f)
    try in.readAllBytes() finally in.close()
  }

  // the round=N partition dir re-materializes `round` on read, so the data
  // column is dropped at write to avoid a partition/data column collision
  def writeResults(round: Int, df: DataFrame): Unit =
    df.drop("round").write.mode(SaveMode.Overwrite).parquet(p("results", s"round=$round"))

  /** JSONL export of a round's results (S5 parity: the reference POSTs one
    * `PageResponse` JSON per page to the callback url,
    * server/src/http.rs:46-84). One JSON object per line
    * (`to_json(struct(*))` — binary `priority` renders as base64), written
    * NEXT TO the parquet results, never instead of them. The reference's
    * `response_timings` field ({start_time, end_time, name} with
    * name = "PageResponse.{url}", responses/src/response_timings.rs:5-10)
    * is rendered from the row's VIRTUAL clock stamps — same schema, but
    * deterministic where the reference stamps wall time. */
  def writeResultsJsonl(round: Int, df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, concat, date_format, lit, struct, timestamp_millis, to_json}
    val fmt = "yyyy-MM-dd HH:mm:ss.SSS 'UTC'" // DateTime<Utc>.to_string shape
    val d = df.drop("round")
      .withColumn("response_timings", struct(
        date_format(timestamp_millis(col("fetch_start_ms")), fmt).as("start_time"),
        date_format(timestamp_millis(col("fetch_end_ms")), fmt).as("end_time"),
        concat(lit("PageResponse."), col("url")).as("name")))
    d.select(to_json(struct(d.columns.map(col): _*)).as("value"))
      .write.mode(SaveMode.Overwrite).text(p("results_jsonl", s"round=$round"))
  }

  def readResultsJsonl(round: Int): DataFrame =
    spark.read.json(p("results_jsonl", s"round=$round"))

  /** Seen urls are stored partitioned by `bucket` = pmod(xxhash64(url), B) so
    * scans parallelize uniformly and per-bucket maintenance (bloom files,
    * compaction) has a natural unit. */
  def writeSeen(round: Int, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(p("seen", s"round=$round"))

  def writeFrontier(round: Int, df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(p("frontier", s"round=$round"))

  def writeMetrics(round: Int, df: DataFrame): Unit =
    df.drop("round").write.mode(SaveMode.Overwrite).parquet(p("metrics", s"round=$round"))

  /** Per-bucket seen-Bloom filters for the round (cumulative through the
    * round): one binary file per bucket under blooms/round=N/. Tiny (the
    * broadcast payload), rewritten whole each round. */
  def writeBlooms(round: Int, blooms: Map[Int, Array[Byte]]): Unit = {
    val dir = hp("blooms", s"round=$round")
    fs.mkdirs(dir)
    blooms.foreach { case (bucket, bytes) =>
      val out = fs.create(new HPath(dir, s"bucket=$bucket.bloom"), true)
      try out.write(bytes) finally out.close()
    }
  }

  def readBlooms(round: Int): Map[Int, Array[Byte]] = {
    val dir = hp("blooms", s"round=$round")
    if (!fs.exists(dir)) return Map.empty
    val rx = "bucket=(\\d+)\\.bloom".r
    fs.listStatus(dir).flatMap { st =>
      st.getPath.getName match {
        case rx(b) => Some(b.toInt -> readBytes(st.getPath))
        case _ => None
      }
    }.toMap
  }

  /** Atomic commit marker: write to a temp file, then rename into place. */
  def commitRound(round: Int, manifestJson: String): Unit =
    atomicWrite(hp("manifest"), s"round=$round.json",
      manifestJson.getBytes(StandardCharsets.UTF_8))

  /** Highest committed round, or -1 if none. */
  def lastCommittedRound(): Int = {
    val dir = hp("manifest")
    if (!fs.exists(dir)) return -1
    val rx = "round=(\\d+)\\.json".r
    fs.listStatus(dir).foldLeft(-1) { (best, st) =>
      st.getPath.getName match {
        case rx(n) => math.max(best, n.toInt)
        case _ => best
      }
    }
  }

  def readFrontier(round: Int): DataFrame =
    spark.read.parquet(p("frontier", s"round=$round"))

  private val uptoRx = "upto=(\\d+)".r

  /** Rounds with a COMMITTED compaction snapshot (`upto=N` dir whose Spark
    * `_SUCCESS` marker exists). The marker IS the commit point — a
    * separate watermark file would need delete-then-rename to update,
    * whose crash window silently un-compacts the table. */
  private def snapshotRounds(): Seq[Int] = {
    val dir = hp("seen_compacted")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case uptoRx(n) if fs.exists(new HPath(st.getPath, "_SUCCESS")) =>
          Some(n.toInt)
        case _ => None
      }
    }
  }

  /** The round whose compaction snapshot covers all seen slices ≤ it, or
    * -1 when the seen table has never been compacted. */
  def compactionWatermark(): Int = snapshotRounds().foldLeft(-1)(math.max)

  /** All committed seen urls up to `round` (inclusive), as (url, bucket):
    * the latest compaction snapshot plus the per-round tail slices after
    * it. Without compaction the union grows one directory per round — a
    * listing/small-files problem at thousands of rounds — which is exactly
    * what [[compactSeen]] bounds. */
  def readSeen(upToRound: Int): Option[DataFrame] = {
    val snaps = snapshotRounds()
    // any view older than the NEWEST snapshot may need per-round slices the
    // compaction already garbage-collected (even when an older snapshot
    // still survives mid-sweep, its tail dirs are gone) — fail loudly
    // instead of silently serving a truncated seen set (duplicate crawls).
    // The engine never asks for such a view: compaction only ever runs on
    // committed rounds, so every resume point is ≥ the newest snapshot.
    require(snaps.isEmpty || snaps.max <= upToRound,
      s"seen table is compacted beyond round $upToRound " +
        s"(snapshots at ${snaps.sorted.mkString(",")}) — slices for this view are gone")
    val w = snaps.foldLeft(-1)(math.max)
    val useCompacted = w >= 0
    val compacted =
      if (useCompacted)
        Seq(spark.read.option("basePath", p("seen_compacted", s"upto=$w"))
          .parquet(p("seen_compacted", s"upto=$w")).select("url", "bucket"))
      else Seq.empty
    val tailStart = if (useCompacted) w + 1 else 0
    // bucket= presence, not bare dir existence: a zero-new-seen round
    // writes only _SUCCESS, and schema inference over such a dir throws
    val dirs = (tailStart to upToRound).map(r => p("seen", s"round=$r"))
      .filter(d => hasBuckets(new HPath(d)))
    val tails =
      if (dirs.isEmpty) Seq.empty
      else Seq(spark.read.option("basePath", p("seen")).parquet(dirs: _*)
        .select("url", "bucket"))
    (compacted ++ tails).reduceOption(_.union(_))
  }

  /** Does the dir hold at least one bucket= partition (i.e. actual rows)? */
  private def hasBuckets(dir: HPath): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists(_.getPath.getName.startsWith("bucket="))

  /** One round's new-seen slice (url only); None when the round produced
    * no rows — partitionBy writes no part files for an empty DataFrame and
    * schema inference on the bare dir would fail. Probed via the Hadoop
    * FileSystem API (works on HDFS/object stores, not just local disk). */
  def readSeenSlice(round: Int): Option[DataFrame] = {
    if (!hasBuckets(hp("seen", s"round=$round"))) None
    else Some(spark.read.option("basePath", p("seen"))
      .parquet(p("seen", s"round=$round")).select("url"))
  }

  /** Rewrite every seen slice ≤ `upToRound` (including any previous
    * compaction snapshot) into ONE bucket-partitioned dir, then publish the
    * `_watermark` atomically and drop the superseded per-round dirs. Must
    * only be called for a COMMITTED round. Crash-safe at every step:
    * before the watermark rename, readers still see the per-round layout;
    * after it, they ignore slices ≤ watermark, so the trailing deletes are
    * pure garbage collection. Callers holding a pre-compaction seen
    * DataFrame must re-read it afterwards (the old dirs are gone). */
  def compactSeen(upToRound: Int): Unit = {
    if (compactionWatermark() >= upToRound) return // nothing newer to fold in
    readSeen(upToRound).foreach { df =>
      // the parquet write's _SUCCESS marker is the snapshot's commit point;
      // everything after is pure garbage collection (readers already ignore
      // per-round slices ≤ upToRound and any older/partial snapshot)
      df.write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(p("seen_compacted", s"upto=$upToRound"))
      (0 to upToRound).foreach(r => fs.delete(hp("seen", s"round=$r"), true))
      // sweep EVERY superseded upto=* dir (committed or partial), not just
      // the immediately-previous one — orphans from earlier crashes are
      // collected here instead of accumulating full seen-table copies
      fs.listStatus(hp("seen_compacted")).foreach { st =>
        st.getPath.getName match {
          case uptoRx(n) if n.toInt != upToRound => fs.delete(st.getPath, true)
          case _ =>
        }
      }
    }
  }

  def readResults(): DataFrame =
    spark.read.option("basePath", p("results")).parquet(p("results"))

  def readMetrics(): DataFrame =
    spark.read.option("basePath", p("metrics")).parquet(p("metrics"))
}
