package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The serve-model cache contract behind [[PqSearch.cachedCodebooks]],
  * [[SqSearch.cachedModel]] and [[BqSearch.cachedModel]]: overflow in a
  * long-lived session (many registration-scoped tags) evicts ONLY the
  * least-recently-used entry — never the whole map, which would dump
  * every other corpus's hot model and force a retrain storm.
  */
class ModelCacheSpec extends AnyFunSuite {

  test("inserting the 65th model keeps the 64 hottest; only the LRU entry leaves") {
    val c = new ModelCache[Int](maxEntries = 64)
    (1 to 64).foreach(i => c.getOrElseUpdate(s"k$i")(i))
    // touch k2..k64 so k1 is the least recently used
    (2 to 64).foreach(i => assert(c.getOrElseUpdate(s"k$i")(-1) == i))
    c.getOrElseUpdate("k65")(65)
    assert(!c.contains("k1"), "the LRU entry must be the one evicted")
    (2 to 65).foreach(i =>
      assert(c.contains(s"k$i"), s"hot entry k$i evicted by overflow"))
    assert(c.size == 64)
  }

  test("a cached key never re-runs its trainer; an evicted key re-runs it once") {
    val c = new ModelCache[Int](maxEntries = 2)
    var runs = 0
    def train(v: Int): Int = { runs += 1; v }
    assert(c.getOrElseUpdate("a")(train(1)) == 1)
    assert(c.getOrElseUpdate("a")(train(99)) == 1)
    assert(runs == 1, "cached key retrained")
    c.getOrElseUpdate("b")(train(2))
    c.getOrElseUpdate("c")(train(3)) // evicts "a" only
    assert(runs == 3)
    assert(c.contains("b") && c.contains("c"))
    assert(c.getOrElseUpdate("a")(train(4)) == 4, "evicted key must retrain")
    assert(runs == 4)
  }
}
