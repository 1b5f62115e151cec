package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}

/** Iceberg-shaped table/checkpoint seam over Parquet (SURVEY.md §7.1.5).
  *
  * The sandbox ships no Iceberg jars, so this implements the contract the
  * north rule needs from Iceberg — snapshot-per-round isolation, partition
  * layout on url-host hash buckets, exact resume — with plain Parquet dirs
  * plus an atomically-renamed per-round JSON manifest. A real Iceberg catalog
  * can replace this seam without touching the engine.
  *
  * Layout under `root`:
  * {{{
  *   results/round=N/   part-*.parquet      (append-only, one dir per round)
  *   seen/round=N/      bucket=B/part-*.parquet (append-only per round)
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

  // the round=N partition dir re-materializes `round` on read, so the data
  // column is dropped at write to avoid a partition/data column collision
  def writeResults(round: Int, df: DataFrame): Unit =
    df.drop("round").write.mode(SaveMode.Overwrite).parquet(p("results", s"round=$round"))

  /** JSONL export of a round's results (S5 parity: the reference POSTs one
    * `PageResponse` JSON per page to the callback url,
    * server/src/http.rs:46-84). One JSON object per line
    * (`to_json(struct(*))` — binary `priority` renders as base64), written
    * NEXT TO the parquet results, never instead of them. */
  def writeResultsJsonl(round: Int, df: DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val d = df.drop("round")
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
    val dir = Paths.get(p("blooms", s"round=$round"))
    Files.createDirectories(dir)
    blooms.foreach { case (bucket, bytes) =>
      Files.write(dir.resolve(s"bucket=$bucket.bloom"), bytes)
    }
  }

  def readBlooms(round: Int): Map[Int, Array[Byte]] = {
    val dir = Paths.get(p("blooms", s"round=$round"))
    if (!Files.isDirectory(dir)) return Map.empty
    val rx = "bucket=(\\d+)\\.bloom".r
    val out = scala.collection.mutable.Map.empty[Int, Array[Byte]]
    Files.list(dir).forEach { f: Path =>
      f.getFileName.toString match {
        case rx(b) => out(b.toInt) = Files.readAllBytes(f)
        case _ =>
      }
    }
    out.toMap
  }

  /** Atomic commit marker: write to a temp file, then rename into place. */
  def commitRound(round: Int, manifestJson: String): Unit = {
    val dir = Paths.get(p("manifest"))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"round=$round.json.tmp")
    Files.writeString(tmp, manifestJson)
    Files.move(tmp, dir.resolve(s"round=$round.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Highest committed round, or -1 if none. */
  def lastCommittedRound(): Int = {
    val dir = Paths.get(p("manifest"))
    if (!Files.isDirectory(dir)) return -1
    val rx = "round=(\\d+)\\.json".r
    var best = -1
    Files.list(dir).forEach { f: Path =>
      f.getFileName.toString match {
        case rx(n) => best = math.max(best, n.toInt)
        case _ =>
      }
    }
    best
  }

  def readFrontier(round: Int): DataFrame =
    spark.read.parquet(p("frontier", s"round=$round"))

  /** Union of all committed seen partitions up to `round` (inclusive). */
  def readSeen(upToRound: Int): Option[DataFrame] = {
    val dirs = (0 to upToRound).map(r => p("seen", s"round=$r"))
      .filter(d => Files.exists(Paths.get(d)))
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", p("seen")).parquet(dirs: _*))
  }

  def readResults(): DataFrame =
    spark.read.option("basePath", p("results")).parquet(p("results"))

  def readMetrics(): DataFrame =
    spark.read.option("basePath", p("metrics")).parquet(p("metrics"))
}
