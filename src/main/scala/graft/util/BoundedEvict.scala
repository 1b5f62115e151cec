package graft.util

import java.util.concurrent.ConcurrentHashMap

/** Single-entry random-replacement eviction for the per-executor memo
  * caches (robots parse cache, per-host LinkTypeChecker cache).
  *
  * Why not just `keySet.iterator.next()`: a fresh ConcurrentHashMap
  * iterator always starts at the same bin, so K threads evicting
  * concurrently all pick the SAME victim — K-1 removes are no-ops and the
  * batch nets +K-1 entries, which under sustained executor-thread
  * contention grows the "bounded" cache without bound (measured: a 4096
  * ceiling overflowed to ~4900 under an 8-thread fill). This evictor
  * starts at a per-thread random offset and retries PAST victims a
  * concurrent evictor already claimed, so every call removes exactly one
  * live entry (or the map drained meanwhile) and the cache stays within
  * ceiling + #threads.
  */
object BoundedEvict {
  def evictOne[K, V](m: ConcurrentHashMap[K, V]): Unit = {
    val it = m.keySet().iterator()
    if (!it.hasNext) return
    var victim = it.next()
    var skip = java.util.concurrent.ThreadLocalRandom.current().nextInt(16)
    while (skip > 0 && it.hasNext) { victim = it.next(); skip -= 1 }
    // a null return means a concurrent evictor beat us to this victim —
    // move on to the next resident instead of double-counting the removal
    while (m.remove(victim) == null) {
      if (!it.hasNext) return
      victim = it.next()
    }
  }
}
