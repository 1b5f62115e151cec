package graft.crawl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import java.nio.charset.StandardCharsets

/** Per-round manifest of a partitioned filter inventory (seen-Blooms /
  * frontier-cuckoos): `dir/_inventory` maps every LIVE bucket to the file
  * holding its current filter — which may live in an EARLIER round's dir.
  *
  * This is the r5-verdict #2 fix: the previous carry-forward stream-copied
  * every untouched bucket file through the driver each round — O(total
  * filter bytes + buckets·RTT) per round regardless of delta size (~9 GB of
  * seen-Bloom at the 10^10 design point, serially, every round). With the
  * inventory, a round writes only its TOUCHED bucket files plus one small
  * manifest (O(buckets) text lines); untouched buckets are *referenced*
  * where they already are. GC ([[graft.io.TableIO.gcFilterDirsBelow]])
  * keeps exactly the reachable files, so live bytes stay = inventory size
  * and the dir listing is bounded by the bucket count, never by rounds.
  *
  * Probes resolve through the manifest (one small read per executor);
  * `.dead` cuckoo markers stay physical, zero-byte files (rare by
  * construction, and the next delta writer looks them up in its prev dir).
  * A dir with no `_inventory` (pre-r6 layout, driver-side test writers)
  * falls back to scanning the dir itself — old checkpoints stay readable.
  *
  * Crash safety: the manifest is written via temp-file + rename after the
  * bucket files; a torn/missing manifest only widens the probe's
  * "maybe-seen" set (missing entry ⇒ probe-true ⇒ exact join) — exactness
  * never depends on it.
  */
object FilterInventory {
  val FileName = "_inventory"

  /** Write `dir/_inventory` atomically (temp + rename): one `bucket\tpath`
    * line per live bucket. */
  def write(dir: String, conf: Configuration, entries: Map[Int, String]): Unit = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(conf)
    val tmp = new HPath(d, s"$FileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.toSeq.sortBy(_._1)
      .map { case (b, p) => s"$b\t$p\n" }.mkString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = new HPath(d, FileName)
    if (fs.exists(dst) && !fs.delete(dst, false))
      throw new java.io.IOException(s"delete failed: $dst")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename failed: $tmp -> $dst")
  }

  /** The manifest's bucket → path map, if `dir/_inventory` exists. */
  def read(dir: String, conf: Configuration): Option[Map[Int, String]] = {
    val f = new HPath(dir, FileName)
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    Some(text.linesIterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      line.take(i).toInt -> line.drop(i + 1)
    }.toMap)
  }

  /** Bucket files physically present in `dir` itself (`bucket=N<suffix>`) —
    * the pre-inventory layout, and the fallback when no manifest exists. */
  def scanDir(dir: String, conf: Configuration, suffix: String): Map[Int, String] = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return Map.empty
    val rx = ("bucket=(\\d+)\\Q" + suffix + "\\E").r
    fs.listStatus(d).flatMap { st =>
      st.getPath.getName match {
        case rx(b) => Some(b.toInt -> st.getPath.toString)
        case _ => None
      }
    }.toMap
  }

  /** The live bucket → file map of `dir`: its manifest, or (legacy layout)
    * its own bucket files. */
  def resolve(dir: String, conf: Configuration, suffix: String): Map[Int, String] =
    read(dir, conf).getOrElse(scanDir(dir, conf, suffix))
}
