package graft.stream

import java.sql.Timestamp

import graft.SparkSuite
import graft.schema.Turn
import org.apache.spark.sql.functions._

/** Contracts for the streaming windowed reply-latency percentiles:
  * cross-micro-batch gap stitching (state carries the last turn across
  * the batch split), exact two-product percentile interpolation per
  * window, and heartbeat-driven window finalization through reply-free
  * batches.
  */
class LatencyStreamSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
  private def at(s: Int) = new Timestamp(t0.getTime + s * 1000L)
  private def turn(c: String, i: Int, role: String, ts: Timestamp,
                   tool: Option[String] = None) =
    Turn(c, i, role, "t", tool, ts)

  test("gaps stitch across micro-batches and windows finalize exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Turn](
      org.apache.spark.sql.Encoders.product[Turn], spark.sqlContext)
    val name = s"lat_stream_${System.nanoTime()}"
    val q = LatencyStream.windowedReplyLatency(
        ms.toDS(), watermark = "0 seconds", width = "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // conversation A: user@0 → assistant@10 (gap 10 s);
      // batch split between A's turn 1 and turn 2
      ms.addData(turn("A", 0, "user", at(0)), turn("A", 1, "assistant", at(10)))
      q.processAllAvailable()
      // turn 2 user@20, turn 3 assistant@50 (gap 30 s) — the turn-1 →
      // turn-2 stitch relies on state carried across the split;
      // conversation B contributes a reply-free batch (heartbeat only)
      ms.addData(turn("A", 2, "user", at(20)),
                 turn("A", 3, "assistant", at(50)),
                 turn("B", 0, "user", at(60)))
      q.processAllAvailable()
      // far-future row closes the 10:00 window (heartbeat advances the
      // watermark even though this batch emits no gap rows)
      ms.addData(turn("C", 0, "user", at(3 * 3600)))
      q.processAllAvailable()
      ms.addData(turn("C", 1, "user", at(4 * 3600)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name)
      .where(col("window_start") === lit(t0))
      .as[(Timestamp, Option[String], Long, Double, Double, Long)]
      .collect()
    // gaps 10 s and 30 s (µs): n=2, p50 = interpolated midpoint 20 s,
    // p95 = 10 + 0.9·20 = 29 s, max = 30 s — the two-product formula
    assert(out.length == 1)
    val (_, tool, n, p50, p95, mx) = out.head
    assert(tool.isEmpty && n == 2L && mx == 30000000L)
    assert(p50 == 20000000.0, s"p50 was $p50")
    assert(p95 == 29000000.0, s"p95 was $p95")
  }

  test("session-scoped percentiles segment on reply inactivity, heartbeats never extend a session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Turn](
      org.apache.spark.sql.Encoders.product[Turn], spark.sqlContext)
    val name = s"lat_sess_${System.nanoTime()}"
    val q = LatencyStream.sessionReplyLatency(
        ms.toDS(), watermark = "0 seconds", gap = "30 minutes")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // conv F: replies at 10:00:10 (gap 10 s) and 10:05:30 (gap 30 s) —
      // 5 min apart, SAME session; then a reply at 12:00:40 (gap 40 s) —
      // 115 min of reply inactivity, NEW session. The idle batch between
      // them emits only heartbeats, which must not bridge the gap.
      ms.addData(turn("F", 0, "user", at(0)), turn("F", 1, "assistant", at(10)),
                 turn("F", 2, "user", at(300)),
                 turn("F", 3, "assistant", at(330)))
      q.processAllAvailable()
      ms.addData(turn("G", 0, "user", at(3000))) // heartbeat-only traffic
      q.processAllAvailable()
      ms.addData(turn("F", 4, "user", at(7200)),
                 turn("F", 5, "assistant", at(7240)))
      q.processAllAvailable()
      ms.addData(turn("H", 0, "user", at(4 * 3600)))
      q.processAllAvailable()
      ms.addData(turn("H", 1, "user", at(6 * 3600)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name)
      .where(col("conv_id") === "F")
      .as[(String, Timestamp, Timestamp, Long, Double, Double, Long)]
      .collect().sortBy(_._2.getTime)
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    val (s1, s2) = (out(0), out(1))
    // session 1: gaps 10 s and 30 s → n=2, p50 = 20 s (interpolated)
    assert(s1._4 == 2L && s1._5 == 20000000.0 && s1._7 == 30000000L)
    assert(s1._2 == at(10) && s1._3 == at(330))
    // session 2: the single 40 s gap
    assert(s2._4 == 1L && s2._7 == 40000000L && s2._2 == at(7240))
  }

  test("only consecutive-turn assistant replies count as gaps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Turn](
      org.apache.spark.sql.Encoders.product[Turn], spark.sqlContext)
    val name = s"lat_stream2_${System.nanoTime()}"
    val q = LatencyStream.windowedReplyLatency(
        ms.toDS(), watermark = "0 seconds", width = "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // user→user (no reply), then assistant with tool (one gap, tagged)
      ms.addData(turn("D", 0, "user", at(0)), turn("D", 1, "user", at(5)),
                 turn("D", 2, "assistant", at(12), Some("error")))
      q.processAllAvailable()
      ms.addData(turn("E", 0, "user", at(3 * 3600)))
      q.processAllAvailable()
      ms.addData(turn("E", 1, "user", at(4 * 3600)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name)
      .where(col("window_start") === lit(t0))
      .as[(Timestamp, Option[String], Long, Double, Double, Long)]
      .collect()
    assert(out.length == 1)
    val (_, tool, n, p50, _, mx) = out.head
    assert(tool.contains("error") && n == 1L &&
           p50 == 7000000.0 && mx == 7000000L)
  }
}
