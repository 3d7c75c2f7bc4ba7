package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(1704067200000L + ms)

  // left: (key, lt, id)   right: (key, rt, v)
  private val left = Seq(
    ("a", ts(100), 1), ("a", ts(200), 2), ("a", ts(300), 3),
    ("b", ts(150), 4), // no right row at-or-before
    ("c", ts(500), 5)
  ).toDF("k", "lt", "id")

  private val right = Seq(
    ("a", ts(100), "r100"), ("a", ts(250), "r250"),
    ("b", ts(200), "rb"), ("c", ts(500), "rc")
  ).toDF("k", "rt", "v")

  private def result(df: DataFrame): Map[Int, Option[String]] =
    df.select("id", "v").collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap

  test("inclusive: latest right at-or-before each left time; null when none") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"))
    assert(result(out) === Map(
      1 -> Some("r100"), // equal time matches
      2 -> Some("r100"), // r250 is in the future
      3 -> Some("r250"),
      4 -> None,         // b's only right row is later
      5 -> Some("rc")))
    assert(out.columns.toSeq === Seq("k", "lt", "id", "v"))
  }

  test("strict: equal-time right rows are excluded") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
                            strict = true)
    assert(result(out) === Map(
      1 -> None,          // r100 is simultaneous → excluded
      2 -> Some("r100"),
      3 -> Some("r250"),
      4 -> None,
      5 -> None))         // rc simultaneous
  }

  test("tolerance: matches older than the bound are nulled, not dropped") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt", Seq("v"),
                            toleranceUs = Some(60_000L)) // 60 ms
    assert(out.count() === left.count()) // left-join row cardinality
    assert(result(out) === Map(
      1 -> Some("r100"), // gap 0
      2 -> None,         // gap 100 ms > 60 ms
      3 -> Some("r250"), // gap 50 ms
      4 -> None,
      5 -> Some("rc")))
  }

  test("payload can expose the right time for gap computation") {
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lt", "rt",
                            payload = Seq("v", "rt"))
      .withColumn("gap_us", expr("timestampdiff(MICROSECOND, rt, lt)"))
    val gaps = out.select("id", "gap_us").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(gaps === Map(1 -> 0L, 2 -> 100_000L, 3 -> 50_000L, 4 -> -1L,
                        5 -> 0L))
  }

  test("matches the naive range-join formulation on a generated corpus") {
    def h(z0: Long): Long = { // splitmix64, local to the fixture
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) & Long.MaxValue
    }
    val l = (0 until 400).map { i =>
      (s"k${i % 7}", ts(h(i) % 100000L), i)
    }.toDF("k", "lt", "id")
    val r = (0 until 150).map { i =>
      (s"k${i % 7}", ts(h(i + 7919) % 100000L), s"v$i")
    }.toDF("k", "rt", "v")
    // naive oracle: max-rt right row per left, tie-broken by max v (the
    // operator contract requires unique (k, rt); dedup the fixture first)
    val rUniq = r.groupBy("k", "rt").agg(max("v").as("v"))
    val naive = l.as("l")
      .join(rUniq.as("r"),
            col("l.k") === col("r.k") && col("r.rt") <= col("l.lt"), "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("r.rt").desc_nulls_last)))
      .where(col("rn") === 1)
      .select(col("id"), col("v"))
    val fast = AsOfJoin.asOf(l, rUniq, Seq("k"), "lt", "rt", Seq("v"))
      .select("id", "v")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // fixture sanity: some matched, some null
    assert(fast.where(col("v").isNull).count() > 0)
    assert(fast.where(col("v").isNotNull).count() > 0)
  }
}
