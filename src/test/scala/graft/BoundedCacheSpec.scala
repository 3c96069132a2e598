package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.BoundedCache

class BoundedCacheSpec extends AnyFunSuite {

  test("computes once per key and returns the cached value") {
    var builds = 0
    val c = new BoundedCache[String, Int](maxEntries = 4)
    assert(c.getOrElseUpdate("a") { builds += 1; 1 } == 1)
    assert(c.getOrElseUpdate("a") { builds += 1; 2 } == 1)
    assert(builds == 1)
  }

  test("evicts LRU past the bound and runs the release hook") {
    val released = scala.collection.mutable.ArrayBuffer.empty[Int]
    val c = new BoundedCache[Int, Int](maxEntries = 2, release = released += _)
    c.getOrElseUpdate(1)(10)
    c.getOrElseUpdate(2)(20)
    c.getOrElseUpdate(1)(11) // touch 1 → 2 becomes LRU
    c.getOrElseUpdate(3)(30) // evicts 2
    assert(released.toList == List(20))
    assert(c.size == 2)
    // 1 survived the eviction (it was touched), 2 rebuilds
    var rebuilt = false
    assert(c.getOrElseUpdate(1) { rebuilt = true; 99 } == 10)
    assert(!rebuilt)
    assert(c.getOrElseUpdate(2) { rebuilt = true; 21 } == 21)
    assert(rebuilt)
  }

  test("invalidateWhere releases only matching keys") {
    val released = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new BoundedCache[(String, String), String](
      maxEntries = 8, release = released += _)
    c.getOrElseUpdate(("app1", "dsA"))("vA")
    c.getOrElseUpdate(("app1", "dsB"))("vB")
    c.invalidateWhere(_._2 == "dsA")
    assert(released.toList == List("vA"))
    assert(c.size == 1)
  }

  test("invalidateAll flushes every registered cache") {
    val c1 = new BoundedCache[Int, Int]()
    val c2 = new BoundedCache[Int, Int]()
    c1.getOrElseUpdate(1)(1)
    c2.getOrElseUpdate(2)(2)
    BoundedCache.invalidateAll()
    assert(c1.size == 0 && c2.size == 0)
  }

  test("release failures do not break eviction") {
    val c = new BoundedCache[Int, Int](maxEntries = 1,
      release = _ => sys.error("boom"))
    c.getOrElseUpdate(1)(1)
    c.getOrElseUpdate(2)(2) // evicts 1; release throws, swallowed
    assert(c.size == 1)
    assert(c.getOrElseUpdate(2)(99) == 2)
  }
}
