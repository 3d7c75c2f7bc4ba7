package graft.ops

import org.apache.spark.storage.StorageLevel

import graft.SparkSuite

/** LRU-bounded persist memo: eviction unpersists, access refreshes
  * recency, invalidate drops explicitly.
  */
class SessionMemoSpec extends SparkSuite {
  import spark.implicits._

  private def persisted(tag: Int) =
    Seq(tag).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)

  test("eviction beyond maxEntries unpersists the LRU entry") {
    val memo = new SessionMemo[Int](maxEntries = 2)
    val a = memo.getOrElseUpdate(spark, 1)(persisted(1))
    memo.getOrElseUpdate(spark, 2)(persisted(2))
    // touch 1 so 2 is the LRU entry, then insert 3 → 2 evicted
    memo.getOrElseUpdate(spark, 1)(fail("rebuilt a memoized entry"))
    val b = memo.getOrElseUpdate(spark, 3)(persisted(3))
    assert(memo.size == 2)
    // the survivor is still cached; re-requesting 1 returns the same df
    assert(memo.getOrElseUpdate(spark, 1)(fail("rebuilt")) eq a)
    assert(memo.getOrElseUpdate(spark, 3)(fail("rebuilt")) eq b)
    // 2 was evicted → rebuilt on demand (which evicts the new LRU, 1)
    var rebuilt = false
    memo.getOrElseUpdate(spark, 2) { rebuilt = true; persisted(2) }
    assert(rebuilt)
  }

  test("invalidate drops the entry and a rebuild happens on next access") {
    val memo = new SessionMemo[String]()
    memo.getOrElseUpdate(spark, "k")(persisted(7))
    memo.invalidate(spark, "k")
    assert(memo.size == 0)
    var rebuilt = false
    memo.getOrElseUpdate(spark, "k") { rebuilt = true; persisted(7) }
    assert(rebuilt)
  }
}
