package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Crash-window pins for the seen-compaction commit protocol: the
  * `_SUCCESS`-gated snapshot IS the commit point, every later step is
  * idempotent garbage collection. */
class TableIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def seenDf(urls: String*) =
    urls.toDF("url").withColumn("bucket", pmod(xxhash64(col("url")), lit(4)))

  private def urls(io: TableIO, upTo: Int): Set[String] =
    io.readSeen(upTo).get.select("url").collect().map(_.getString(0)).toSet

  test("watermark gating, stale-slice ignore, orphan sweep, over-compaction error") {
    val dir = java.nio.file.Files.createTempDirectory("tableio").toString
    val io = new TableIO(spark, dir)
    io.writeSeen(0, seenDf("a", "b"))
    io.writeSeen(1, seenDf("c"))
    io.writeSeen(2, seenDf("d"))

    io.compactSeen(1)
    assert(io.compactionWatermark() == 1)
    assert(urls(io, 2) == Set("a", "b", "c", "d"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/seen/round=1")))

    // crash window: a per-round slice ≤ watermark resurfaces (GC deletes
    // interrupted) — readers must ignore it, never double-read or fold it
    io.writeSeen(0, seenDf("bogus"))
    assert(urls(io, 2) == Set("a", "b", "c", "d"))

    // crash window: a partial snapshot without _SUCCESS is not a commit
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/seen_compacted/upto=5"))
    assert(io.compactionWatermark() == 1)

    // the next compaction folds the tail and sweeps BOTH the stale slice
    // and every superseded/partial snapshot dir
    io.compactSeen(2)
    assert(io.compactionWatermark() == 2)
    assert(urls(io, 2) == Set("a", "b", "c", "d"))
    Seq(s"$dir/seen_compacted/upto=1", s"$dir/seen_compacted/upto=5",
        s"$dir/seen/round=0").foreach { p =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)), p)
    }

    // a view older than every snapshot cannot be served — loud failure,
    // never a silently truncated seen set
    assertThrows[IllegalArgumentException](io.readSeen(0))

    // idempotent re-call: nothing newer to fold in
    io.compactSeen(2)
    assert(urls(io, 2) == Set("a", "b", "c", "d"))
  }

  test("append-table compaction: ranges accumulate, history never re-copied, crash windows safe") {
    val dir = java.nio.file.Files.createTempDirectory("tableio-append").toString
    val io = new TableIO(spark, dir)
    def write(r: Int, vals: String*): Unit =
      io.writeResults(r, vals.toDF("url").withColumn("round", lit(r)))
    def view: Set[(Int, String)] = io.readResults()
      .select(col("round").cast("int"), col("url")).collect()
      .map(x => (x.getInt(0), x.getString(1))).toSet

    write(0, "a", "b"); write(1, "c"); write(2, "d")
    val all = Set(0 -> "a", 0 -> "b", 1 -> "c", 2 -> "d")
    assert(view == all)

    io.compactResults(1)
    assert(io.appendCompactionWatermark("results") == 1)
    assert(view == all)
    // tail rounds ≤ watermark are gone; later rounds untouched
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/results/round=0")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/results/round=2")))

    // crash window: a tail dir ≤ watermark resurfaces (interrupted GC) —
    // readers must ignore it, never double-read
    write(0, "bogus")
    assert(view == all)

    // crash window: a range dir without _SUCCESS is not a commit and is
    // swept by the next attempt
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/results_compacted/range=2-9"))
    assert(io.appendCompactionWatermark("results") == 1)

    write(3, "e")
    io.compactResults(3)
    assert(io.appendCompactionWatermark("results") == 3)
    assert(view == all + (3 -> "e"))
    // the first snapshot range was NOT rewritten (append-only: each sweep
    // touches only the tail), and the partial range dir is gone
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/results_compacted/range=0-1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/results_compacted/range=2-3")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/results_compacted/range=2-9")))

    // idempotent re-call + fresh tail after compaction still reads
    io.compactResults(3)
    write(4, "f")
    assert(view == all + (3 -> "e") + (4 -> "f"))
  }
}
