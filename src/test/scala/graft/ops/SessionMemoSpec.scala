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

  test("a slow build on one key does not block other keys (per-key locks)") {
    val memo = new SessionMemoOf[Int, String]()
    val slowEntered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() =>
      memo.getOrElseUpdate(spark, 1) {
        slowEntered.countDown(); release.await(); "slow"
      })
    slow.start()
    slowEntered.await()
    // with the old memo-wide monitor this deadlocked until `release`
    val fastDone = new java.util.concurrent.CountDownLatch(1)
    val fast = new Thread(() => {
      memo.getOrElseUpdate(spark, 2)("fast"); fastDone.countDown()
    })
    fast.start()
    assert(fastDone.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "independent key blocked behind an in-flight build")
    release.countDown(); slow.join(5000)
    assert(memo.getOrElseUpdate(spark, 1)(fail("rebuilt")) == "slow")
  }

  test("concurrent requests for one key run build exactly once") {
    val memo = new SessionMemoOf[Int, Integer]()
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map(_ => new Thread(() =>
      memo.getOrElseUpdate(spark, 42) { Integer.valueOf(n.incrementAndGet()) }))
    threads.foreach(_.start()); threads.foreach(_.join(5000))
    assert(n.get() == 1)
  }

  test("a failed build is removed from the map and does not block eviction") {
    val memo = new SessionMemoOf[Int, String](maxEntries = 2)
    intercept[RuntimeException] {
      memo.getOrElseUpdate(spark, 1)(throw new RuntimeException("boom"))
    }
    // the poisoned cell must not linger as a never-done eldest
    assert(memo.size == 0)
    // a retry on the same key rebuilds cleanly
    assert(memo.getOrElseUpdate(spark, 1)("ok") == "ok")
    // and eviction still cycles: 3 inserts on maxEntries=2 stays bounded
    memo.getOrElseUpdate(spark, 2)("b")
    memo.getOrElseUpdate(spark, 3)("c")
    assert(memo.size == 2)
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
