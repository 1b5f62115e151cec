package graft.crawl

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}

/** From-scratch partial-key cuckoo filter (Fan, Andersen, Kaminsky,
  * Mitzenmacher — "Cuckoo Filter: Practically Better Than Bloom",
  * CoNEXT 2014). The north rule names "a partitioned Bloom/cuckoo URL-seen
  * filter"; the Bloom covers the monotone SEEN set (union-mergeable, only
  * ever grows), while this covers the FRONTIER set (url enters when
  * enqueued, leaves when scheduled) — deletion is the one operation a Bloom
  * fundamentally cannot do, and without it the frontier filter would need a
  * full O(|frontier|) rebuild every round instead of an O(|delta|) update.
  *
  * Layout: `numBuckets` (power of two) buckets × 4 slots of 16-bit
  * fingerprints in one Char array; 0 = empty (fingerprint 0 remaps to 1).
  * An item hashes to bucket i1 = mix(h) & mask and its alternate
  * i2 = i1 ^ (mix(fp) & mask) — partial-key cuckoo hashing, so membership
  * and deletion only ever inspect two buckets (two cache lines). At the
  * ~0.84 fill [[CuckooFilter.create]] sizes for, the false-positive rate is
  * ≈ 2·4/2^16 ≈ 0.012% — far below the seen-Bloom's 3%, bought with
  * ~2.4 bytes/item vs ~0.9: the frontier filter gates a join against the
  * 10^10-row frontier, where a false positive costs an exact-join probe, so
  * the trade leans toward fingerprint width (and the frontier is ~100×
  * smaller than the cumulative seen set, so the absolute budget stays small).
  *
  * Determinism: eviction choices come from a serialized xorshift64 state, so
  * the same insert/delete sequence yields byte-identical filters across runs
  * and resumes (same policy as the corpus-pinned splitmix64 kernels).
  *
  * SATURATION CONTRACT: a failed [[insert]] (MaxKicks evictions without a
  * home) leaves one displaced fingerprint with no slot — the filter has LOST
  * a membership and can return false negatives from that point on. The
  * caller MUST discard the filter and treat the bucket as
  * probe-everything-true ([[graft.crawl.FrontierFilter]] writes a `.dead`
  * marker; a missing filter file falls back to the exact anti-join, so
  * correctness never depends on the filter inventory).
  */
final class CuckooFilter private (
    val numBuckets: Int,
    private val table: Array[Char],
    private var rng: Long) {

  import CuckooFilter._

  private val mask = numBuckets - 1

  private def indexOf(h: Long): Int = (mix(h) & mask).toInt

  private def fpOf(h: Long): Char = {
    val f = ((mix(h) >>> 48) & 0xFFFFL).toInt
    (if (f == 0) 1 else f).toChar
  }

  /** Symmetric: altIndex(altIndex(i, fp), fp) == i — an entry's two homes
    * are recoverable from either, which is what makes delete-after-kicks
    * sound. */
  private def altIndex(i: Int, fp: Char): Int = (i ^ (mix(fp.toLong) & mask)).toInt

  private def bucketHas(i: Int, fp: Char): Boolean = {
    val b = i << 2
    table(b) == fp || table(b + 1) == fp || table(b + 2) == fp || table(b + 3) == fp
  }

  private def tryPut(i: Int, fp: Char): Boolean = {
    val b = i << 2
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b + s) == 0) { table(b + s) = fp; return true }
      s += 1
    }
    false
  }

  private def removeAt(i: Int, fp: Char): Boolean = {
    val b = i << 2
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b + s) == fp) { table(b + s) = 0; return true }
      s += 1
    }
    false
  }

  /** No false negatives w.r.t. the inserted-minus-deleted multiset, as long
    * as every insert succeeded and every delete targeted an inserted item. */
  def mightContain(h: Long): Boolean = {
    val fp = fpOf(h)
    val i1 = indexOf(h)
    bucketHas(i1, fp) || bucketHas(altIndex(i1, fp), fp)
  }

  /** False ⇒ the filter is saturated AND now invalid (see the class-doc
    * saturation contract). */
  def insert(h: Long): Boolean = {
    val fp0 = fpOf(h)
    val i1 = indexOf(h)
    val i2 = altIndex(i1, fp0)
    if (tryPut(i1, fp0) || tryPut(i2, fp0)) return true
    var fp = fp0
    var i = if (nextInt(2) == 0) i1 else i2
    var kicks = 0
    while (kicks < MaxKicks) {
      val b = i << 2
      val s = nextInt(SlotsPerBucket)
      val evicted = table(b + s)
      table(b + s) = fp
      fp = evicted
      i = altIndex(i, fp)
      if (tryPut(i, fp)) return true
      kicks += 1
    }
    false
  }

  /** Removes ONE copy of the item's fingerprint from its bucket pair.
    * Deleting an item that was never inserted can evict a colliding
    * neighbor (⇒ false negatives) — callers must guarantee
    * deletes ⊆ live inserts, which the frontier protocol does by
    * construction (departed urls were all enqueued). */
  def delete(h: Long): Boolean = {
    val fp = fpOf(h)
    val i1 = indexOf(h)
    removeAt(i1, fp) || removeAt(altIndex(i1, fp), fp)
  }

  /** Occupied slots (diagnostic). */
  def occupied: Int = {
    var n = 0
    var i = 0
    while (i < table.length) { if (table(i) != 0) n += 1; i += 1 }
    n
  }

  def byteSize: Long = 4L + 4L + 8L + table.length * 2L

  private def nextInt(n: Int): Int = {
    rng ^= rng << 13
    rng ^= rng >>> 7
    rng ^= rng << 17
    ((rng >>> 33) % n).toInt
  }

  def writeTo(out: OutputStream): Unit = {
    val d = new DataOutputStream(out)
    d.writeInt(Version)
    d.writeInt(numBuckets)
    d.writeLong(rng)
    // bulk big-endian encode: per-char writeChar on an unbuffered stream is
    // one syscall-ish hop per SLOT — at a 32k-bucket filter that is 128k
    // round trips per file, and the delta writer touches every populated
    // bucket file each round
    val buf = new Array[Byte](table.length * 2)
    var i = 0
    while (i < table.length) {
      buf(2 * i) = (table(i) >>> 8).toByte
      buf(2 * i + 1) = table(i).toByte
      i += 1
    }
    d.write(buf)
    d.flush()
  }

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(byteSize.toInt)
    writeTo(bos)
    bos.toByteArray
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  private val Version = 1
  /** Target fill at the sized-for load: 4-slot cuckoo tables sustain ~0.95,
    * the headroom absorbs hash skew inside one outer bucket. */
  val TargetLoad = 0.84

  /** Hard per-file ceiling: 2^28 buckets = 2^30 slots = 2 GiB of table —
    * also the point past which the Int bucket math below would overflow.
    * An operator-supplied expectedPerBucket that large is a mis-sharding
    * (raise the OUTER bucket count instead), so fail loudly rather than
    * loop forever on a negative doubling (ADVICE r5). */
  val MaxBuckets: Long = 1L << 28

  def create(expectedItems: Long): CuckooFilter = {
    val needed = math.max(1L, math.ceil(expectedItems / (SlotsPerBucket * TargetLoad)).toLong)
    require(needed <= MaxBuckets,
      s"cuckoo filter sized for $expectedItems items needs $needed buckets " +
        s"(> 2^28 per-file ceiling) — raise the outer bucket count instead")
    var m = 1L
    while (m < needed) m <<= 1
    new CuckooFilter(m.toInt, new Array[Char]((m * SlotsPerBucket).toInt), seedFor(m.toInt))
  }

  private def seedFor(m: Int): Long = 0x9E3779B97F4A7C15L ^ m.toLong

  /** splitmix64 finalizer (public-domain constant set — same kernel family
    * as [[graft.crawl.SeenFilter]]'s url hashing). */
  private[crawl] def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def readFrom(in: InputStream): CuckooFilter = {
    val d = new DataInputStream(in)
    val v = d.readInt()
    require(v == Version, s"unsupported cuckoo filter version $v")
    val m = d.readInt()
    val rng = d.readLong()
    val table = new Array[Char](m * SlotsPerBucket)
    val buf = new Array[Byte](table.length * 2)
    d.readFully(buf) // bulk decode — see writeTo
    var i = 0
    while (i < table.length) {
      table(i) = (((buf(2 * i) & 0xFF) << 8) | (buf(2 * i + 1) & 0xFF)).toChar
      i += 1
    }
    new CuckooFilter(m, table, rng)
  }
}
