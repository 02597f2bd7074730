package graft

import org.scalatest.funsuite.AnyFunSuite

/** The memo-cache bound: inserting past the cap evicts the
  * least-recently-used entry, a hit refreshes recency, and an evicted
  * key simply recomputes (the recomputable-artifact contract every
  * cache built on [[BoundedMemo]] relies on).
  */
class BoundedMemoSpec extends AnyFunSuite {

  test("caps size, evicts the LRU entry, and recomputes after eviction") {
    val m = new BoundedMemo[Int, String](3)
    var computes = 0
    def get(k: Int): String =
      m.getOrElseCompute(k) { computes += 1; s"v$k" }

    (1 to 3).foreach(get)
    assert(m.size === 3 && computes === 3)
    // a HIT refreshes recency: after touching 1, the LRU entry is 2
    get(1)
    get(4) // insert past the cap → evicts 2, not 1
    assert(m.size === 3 && m.keys === Set(1, 3, 4))
    assert(computes === 4)
    // all three live keys are hits
    get(1); get(3); get(4)
    assert(computes === 4)
    // the evicted key recomputes correctly (recency now 1 < 3 < 4,
    // so inserting 2 drops 1)
    assert(get(2) === "v2")
    assert(computes === 5 && m.keys === Set(3, 4, 2))
    // a second read of the recomputed entry is a hit again
    assert(get(2) === "v2" && computes === 5)
  }

  test("putIfAbsent returns the winner on a racing duplicate compute") {
    val m = new BoundedMemo[Int, String](4)
    assert(m.putIfAbsent(7, "first") === "first")
    // the loser of a race keeps the existing entry
    assert(m.putIfAbsent(7, "second") === "first")
    assert(m.get(7) === Some("first"))
  }

  test("getOrElseCompute is single-flight per key: concurrent " +
       "same-key misses run ONE compute, late arrivals read the " +
       "winner's entry") {
    val m = new BoundedMemo[Int, String](8)
    val computes = new java.util.concurrent.atomic.AtomicInteger(0)
    val latch = new java.util.concurrent.CountDownLatch(1)
    def slow(k: Int): String = m.getOrElseCompute(k) {
      computes.incrementAndGet(); Thread.sleep(150); s"v$k"
    }
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ts = (1 to 4).map(_ => new Thread(() => {
      latch.await(); results.add(slow(7))
    }))
    ts.foreach(_.start()); latch.countDown(); ts.foreach(_.join())
    assert(computes.get() === 1)
    assert(results.size === 4 && results.toArray.forall(_ == "v7"))
    assert(m.get(7) === Some("v7"))
  }

  test("removeIf drops matching keys only") {
    val m = new BoundedMemo[Int, String](8)
    (1 to 5).foreach(k => m.putIfAbsent(k, s"v$k"))
    m.removeIf(_ % 2 == 0)
    assert(m.keys === Set(1, 3, 5))
    m.clear()
    assert(m.size === 0)
  }
}
