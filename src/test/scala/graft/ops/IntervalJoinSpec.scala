package graft.ops

import java.sql.Timestamp

import graft.SparkSuite

class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)

  private val points = Seq(
    ("a", 1, ts(0)),    // == interval start (inclusive)
    ("a", 2, ts(90)),   // inside, crosses an hour-bucket boundary
    ("a", 3, ts(120)),  // == interval end (inclusive)
    ("a", 4, ts(121)),  // one past the end → dropped
    ("b", 5, ts(50)),   // same time range, different key → dropped
    ("a", 6, ts(500))   // second interval of key a
  ).toDF("k", "id", "t")

  private val intervals = Seq(
    ("a", ts(0), ts(120), 10),   // spans 3 hour-buckets
    ("a", ts(480), ts(520), 11),
    ("c", ts(0), ts(120), 12)    // key with no points
  ).toDF("k", "s", "e", "iv_id")

  test("containment: inclusive bounds, per-key, multi-bucket intervals") {
    val out = IntervalJoin.containment(points, intervals, Seq("k"),
        "t", "s", "e", payload = Seq("iv_id"))
      .select("id", "iv_id").as[(Int, Int)].collect().toMap
    assert(out === Map(1 -> 10, 2 -> 10, 3 -> 10, 6 -> 11))
  }

  test("bucketized == naive range join on a generated corpus") {
    def h(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) & Long.MaxValue
    }
    val p = (0 until 500).map { i =>
      (s"k${i % 5}", i, ts(h(i) % 3000L))
    }.toDF("k", "id", "t")
    // non-overlapping per-key intervals with gaps between them
    val iv = (0 until 60).map { i =>
      val base = (i / 5) * 250L
      (s"k${i % 5}", ts(base), ts(base + 170L + h(i) % 60L), i)
    }.toDF("k", "s", "e", "iv_id")
    val fast = IntervalJoin.containment(p, iv, Seq("k"), "t", "s", "e",
        payload = Seq("iv_id"))
      .select("id", "iv_id")
    val naive = p.as("p").join(iv.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.s" && $"p.t" <= $"i.e")
      .select($"p.id", $"i.iv_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() > 0 && fast.count() < p.count()) // fixture sanity
  }

  test("overlapping intervals yield one row per containing interval") {
    val p = Seq(("a", 1, ts(60))).toDF("k", "id", "t")
    val iv = Seq(("a", ts(0), ts(120), 1), ("a", ts(30), ts(90), 2))
      .toDF("k", "s", "e", "iv_id")
    val out = IntervalJoin.containment(p, iv, Seq("k"), "t", "s", "e",
        payload = Seq("iv_id"))
      .select("iv_id").as[Int].collect().toSet
    assert(out === Set(1, 2))
  }
}
