package graft

/** Size-capped, access-ordered (LRU) memo for per-session derived
  * artifacts — the container behind every in-process statistics/index
  * cache here ([[LlmOps.pqIndex]], [[LlmOps.bpeTrain]],
  * [[LlmOps.jaccardComponents]], [[LlmOps.kmIndex]], the Jaccard cost
  * probe). A long-lived session churning many corpora previously grew
  * those maps without bound; the cap makes the memory ceiling explicit
  * and eviction drops the least-recently-USED entry.
  *
  * Two contracts keep eviction safe and cheap:
  *  - values are RECOMPUTABLE pure artifacts (measured statistics,
  *    localCheckpoint'd frames): an evicted entry costs at most one
  *    recompute on the next call — correctness never depends on a hit,
  *    and a dropped frame's checkpoint blocks are reclaimed by Spark's
  *    ContextCleaner once unreferenced;
  *  - the lock covers only the tiny map — callers run their Spark job
  *    OUTSIDE it (get → compute → [[putIfAbsent]]), so a slow probe
  *    never serializes unrelated callers, and a racing duplicate
  *    compute just re-derives the same deterministic value.
  */
private[graft] final class BoundedMemo[K, V](val cap: Int) {
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[K, V]): Boolean = this.size() > cap
  }

  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))

  /** Insert if absent; returns the winning value (the existing entry
    * when a racing compute got there first — both are the same
    * deterministic artifact, the loser is simply dropped).
    */
  def putIfAbsent(k: K, v: V): V = m.synchronized {
    val prev = m.get(k) // also refreshes LRU recency on a hit
    if (prev != null) prev else { m.put(k, v); v }
  }

  // per-key in-flight compute locks: same-key misses serialize (one
  // multi-job index build per key, as ConcurrentHashMap.computeIfAbsent
  // gave the old caches), DIFFERENT keys and all hits stay parallel —
  // the map lock itself is never held across a compute
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[K, AnyRef]()

  /** get → compute(outside the map lock, single-flight per key) →
    * putIfAbsent. A racing thread on the SAME key waits and then reads
    * the winner's entry instead of duplicating an expensive build; the
    * only duplicate-compute window left is an eviction landing between
    * a winner's put and a waiter's re-read — values are recomputable,
    * so that is a cost blip, not a correctness issue.
    */
  def getOrElseCompute(k: K)(f: => V): V =
    get(k).getOrElse {
      val lock = inFlight.computeIfAbsent(k, _ => new AnyRef)
      try lock.synchronized {
        get(k).getOrElse(putIfAbsent(k, f))
      } finally inFlight.remove(k, lock) // two-arg: only drop OUR lock —
      // a bare remove(k) could delete a NEWER lock a third thread just
      // installed, widening the duplicate-compute window
    }

  def removeIf(p: K => Boolean): Unit = m.synchronized {
    val it = m.keySet.iterator
    while (it.hasNext) if (p(it.next())) it.remove()
  }

  def clear(): Unit = m.synchronized(m.clear())

  def size: Int = m.synchronized(m.size)

  private[graft] def keys: Set[K] = m.synchronized {
    val b = Set.newBuilder[K]; m.keySet.forEach(b += _); b.result()
  }
}
