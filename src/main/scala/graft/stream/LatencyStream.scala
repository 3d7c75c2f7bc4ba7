package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.Turn

/** Streaming reply-latency percentiles — the north rule's
  * "session-window query latency p95" computed LIVE per event-time
  * window instead of post-hoc ([[graft.ops.Quantiles]] is the batch
  * twin): per-conversation keyed state tracks the last turn position,
  * each arriving assistant turn emits its reply gap in integer
  * microseconds, and a downstream windowed EXACT `percentile`
  * aggregation finalizes (p50, p95, max) per (hour, tool) on watermark.
  *
  * Chaining shape (the [[CsrState.attachSalted]] pattern): the gap
  * emission is an object map, so the event-time tag does not survive it
  * — the operator takes an UN-watermarked stream and declares the
  * watermark ONCE on its own output. Because gap rows only exist for
  * assistant turns, every conversation also emits one HEARTBEAT row per
  * micro-batch carrying its batch-max event time; heartbeats pass
  * through the watermark operator (advancing it exactly as the raw
  * stream would), aggregate as their own tagged groups, and are dropped
  * after the aggregation — without them, a quiet period with no replies
  * would stall window finalization.
  *
  * Scale shape: state is two longs per open conversation (the keyed
  * shuffle is the same conv_id clustering every CEP query here rides);
  * the exact windowed percentile holds per-(window, tool) value
  * multisets — right for dimension-sized tool cardinality, swap
  * `approx_percentile` (KLL, bounded buffers) above it. NoTimeout keeps
  * a closed conversation's 16-byte state until the query ends; a TTL
  * deployment uses ProcessingTimeTimeout at the cost of losing the
  * first gap of a conversation resuming after eviction.
  */
object LatencyStream {

  /** Last-seen turn per conversation: (turn_idx, event-time micros). */
  final case class LastTurn(idx: Int, tsUs: Long)

  /** One reply gap; `gap_us` = −1 marks a watermark heartbeat (whose
    * `conv` carries the disjoint [[HeartbeatConvPrefix]] so a
    * session-keyed aggregation never merges it into a real session).
    */
  final case class Gap(conv: String, tool: Option[String], gap_us: Long,
                       ts: Timestamp)

  /** Tool tag carried by heartbeat rows (filtered pre-aggregation). */
  val HeartbeatTool = "zz_hb"

  /** Conversation-key prefix of heartbeat rows — must be disjoint from
    * every real conversation id.
    */
  val HeartbeatConvPrefix = "zz~"

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  private def emitGaps(convId: String, it: Iterator[Turn],
                       state: GroupState[LastTurn]): Iterator[Gap] = {
    // within-batch arrival order is not guaranteed; turn_idx is the
    // conversation order (dense, ts-ranked — gen/Transcripts.scala)
    val rows = it.toArray.sortBy(_.turn_idx)
    val out = scala.collection.mutable.ArrayBuffer.empty[Gap]
    var last = state.getOption
    var maxUs = Long.MinValue
    rows.foreach { t =>
      val tus = micros(t.ts)
      if (tus > maxUs) maxUs = tus
      // monotonicity guard: a later micro-batch may carry an earlier
      // turn_idx (late-but-within-watermark data) — regressing the
      // stored index would re-emit an already-seen gap on the next
      // idx+1 arrival. Stale rows neither emit nor update state.
      if (!last.exists(l => t.turn_idx <= l.idx)) {
        last.foreach { l =>
          if (t.role == "assistant" && t.turn_idx == l.idx + 1)
            out += Gap(convId, t.tool, tus - l.tsUs, t.ts)
        }
        last = Some(LastTurn(t.turn_idx, tus))
      }
    }
    last.foreach(state.update)
    out += Gap(HeartbeatConvPrefix + convId, Some(HeartbeatTool), -1L,
               new Timestamp(maxUs / 1000L))
    out.iterator
  }

  /** (window_start, tool, n, p50_us, p95_us, max_us) per event-time
    * tumbling window of `width`, finalized in append mode once the
    * watermark (declared on the gap stream, delay `watermark`) passes
    * the window end. Runs identically on a batch Dataset[Turn]
    * (ScalaTest parity).
    */
  def windowedReplyLatency(turns: Dataset[Turn],
                           watermark: String = "10 minutes",
                           width: String = "1 hour"): DataFrame = {
    implicit val stateEnc: org.apache.spark.sql.Encoder[LastTurn] =
      Encoders.product[LastTurn]
    implicit val outEnc: org.apache.spark.sql.Encoder[Gap] =
      Encoders.product[Gap]
    turns
      .groupByKey(_.conv_id)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(emitGaps)
      .toDF()
      .withWatermark("ts", watermark)
      // heartbeats must PASS the watermark operator. Neither a
      // pre-aggregation `where(gap_us >= 0)` nor a post-aggregation
      // filter on the GROUPING column survives the optimizer: both
      // predicate-push below the aggregate and then below
      // EventTimeWatermark (conjuncts not referencing the event-time
      // column push through), dropping heartbeats before they can
      // advance the watermark — every window stalls forever. Heartbeats
      // therefore ride to the aggregation as their own (window, zz_hb)
      // groups and are dropped by a filter on an AGGREGATED column
      // (max_us = −1 exactly for all-heartbeat groups), which cannot be
      // pushed through the aggregate.
      .groupBy(window(col("ts"), width).as("w"), col("tool"))
      .agg(count(lit(1)).as("n"),
           percentile(col("gap_us"), lit(0.5)).as("p50_us"),
           percentile(col("gap_us"), lit(0.95)).as("p95_us"),
           max(col("gap_us")).as("max_us"))
      .where(col("max_us") >= 0)
      .select(col("w.start").as("window_start"), col("tool"),
              col("n"), col("p50_us"), col("p95_us"), col("max_us"))
  }

  /** The north-rule metric VERBATIM — "session-window query latency
    * p95": reply-gap order statistics per `session_window(ts, gap)` ×
    * conversation, finalized in append mode when the watermark passes a
    * session's close. Sessions are segmented over the GAP events (an
    * assistant reply more than `gap` after the previous reply opens a
    * new latency session — the [[graft.ops.Sessions]] islands semantics
    * on the reply stream). Heartbeat rows ride under their disjoint
    * [[HeartbeatConvPrefix]] conversation key, so they advance the
    * watermark without ever merging into (or extending) a real session,
    * and are dropped by the same aggregated-column filter. Output:
    * (conv_id, session_start, session_end, n, p50_us, p95_us, max_us).
    */
  def sessionReplyLatency(turns: Dataset[Turn],
                          watermark: String = "10 minutes",
                          gap: String = "30 minutes"): DataFrame = {
    implicit val stateEnc: org.apache.spark.sql.Encoder[LastTurn] =
      Encoders.product[LastTurn]
    implicit val outEnc: org.apache.spark.sql.Encoder[Gap] =
      Encoders.product[Gap]
    turns
      .groupByKey(_.conv_id)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(emitGaps)
      .toDF()
      .withWatermark("ts", watermark)
      .groupBy(col("conv").as("conv_id"),
               session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"),
           min("ts").as("session_start"),
           max("ts").as("session_end"),
           percentile(col("gap_us"), lit(0.5)).as("p50_us"),
           percentile(col("gap_us"), lit(0.95)).as("p95_us"),
           max(col("gap_us")).as("max_us"))
      .where(col("max_us") >= 0)
      .select(col("conv_id"), col("session_start"), col("session_end"),
              col("n"), col("p50_us"), col("p95_us"), col("max_us"))
  }
}
