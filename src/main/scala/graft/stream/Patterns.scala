package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.schema.Turn

/** CEP sequence-pattern detection: maximal runs of ≥ `minLen` CONSECUTIVE
  * turns (by turn_idx) that carry a tool tag, per conversation — the
  * pattern `TOOL{minLen,}` over each conversation's event sequence (the
  * transcript analog of the reference's chain-detection over consecutive
  * path segments, builders.py:302-430: a "run" there is a maximal stretch
  * of adjacent intervals on one segment).
  *
  * Two execution paths with identical output:
  *   - [[toolRuns]]: the batch gaps-and-islands plan (one turn-order sort
  *     shuffle; `idx − row_number` is constant within a run).
  *   - [[attach]]: the streaming path — flagged turns buffered as keyed
  *     state in `flatMapGroupsWithState`, runs emitted ONCE per
  *     conversation when the event-time timeout finalizes it (matches
  *     must not be emitted early: a run that is still growing at batch
  *     boundary would double-report). State per conversation is O(flagged
  *     turns), evicted at finalization — bounded by the watermark, not by
  *     stream length.
  */
object Patterns {

  /** Keyed state: flagged turn indices (sorted, distinct) + each one's
    * tool tag (parallel array) + the conversation's max event time.
    */
  case class RunState(idxs: Array[Int], tools: Array[String], lastTsMs: Long)

  case class RunMatch(conv_id: String, start_idx: Int, end_idx: Int,
                      run_len: Int, n_tools: Int)

  /** Batch twin: islands of consecutive flagged turn_idx per conv_id. */
  def toolRuns(turns: DataFrame, minLen: Int = 2): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns.where(col("tool").isNotNull)
      .withColumn("grp", col("turn_idx") - row_number().over(w))
      .groupBy("conv_id", "grp")
      .agg(min("turn_idx").as("start_idx"),
           max("turn_idx").as("end_idx"),
           count(lit(1)).cast("int").as("run_len"),
           countDistinct("tool").cast("int").as("n_tools"))
      .where(col("run_len") >= minLen)
      .select("conv_id", "start_idx", "end_idx", "run_len", "n_tools")
  }

  /** Scan kernel over the sorted flagged indices: maximal consecutive
    * stretches, with the distinct-tool count per stretch. Pure function —
    * PatternsSpec exercises it exhaustively.
    */
  private[stream] def runsOf(convId: String, idxs: Array[Int],
                             tools: Array[String],
                             minLen: Int): Iterator[RunMatch] = {
    if (idxs.isEmpty) return Iterator.empty
    val out = Seq.newBuilder[RunMatch]
    var start = 0
    var i = 1
    def close(endExcl: Int): Unit = {
      val len = endExcl - start
      if (len >= minLen) {
        val distinct = new scala.collection.mutable.HashSet[String]
        var k = start
        while (k < endExcl) { distinct += tools(k); k += 1 }
        out += RunMatch(convId, idxs(start), idxs(endExcl - 1), len,
                        distinct.size)
      }
      start = endExcl
    }
    while (i < idxs.length) {
      if (idxs(i) != idxs(i - 1) + 1) close(i)
      i += 1
    }
    close(idxs.length)
    out.result().iterator
  }

  private def update(minLen: Int, idleTimeoutMs: Long)(
      convId: String, turns: Iterator[Turn], state: GroupState[RunState])
      : Iterator[RunMatch] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      runsOf(convId, s.idxs, s.tools, minLen)
    } else {
      val prev = state.getOption.getOrElse(RunState(Array.empty, Array.empty, 0L))
      val delta = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
      var maxTs = prev.lastTsMs
      turns.foreach { t =>
        delta += ((t.turn_idx, t.tool.orNull))
        val ts = t.ts.getTime
        if (ts > maxTs) maxTs = ts
      }
      // merge the sorted per-batch delta into the sorted previous state
      // (same O(n + d log d) shape as CsrState's kernel); duplicate idx
      // keeps the first-seen tool — idempotent under replayed input
      val d = delta.sortBy(_._1)
      val idxs = new scala.collection.mutable.ArrayBuilder.ofInt
      val tools = Seq.newBuilder[String]
      var i = 0; var j = 0; var last = Int.MinValue
      def emit(idx: Int, tool: String): Unit =
        if (idx != last) { idxs += idx; tools += tool; last = idx }
      while (i < prev.idxs.length && j < d.length) {
        if (prev.idxs(i) <= d(j)._1) { emit(prev.idxs(i), prev.tools(i)); i += 1 }
        else { emit(d(j)._1, d(j)._2); j += 1 }
      }
      while (i < prev.idxs.length) { emit(prev.idxs(i), prev.tools(i)); i += 1 }
      while (j < d.length) { emit(d(j)._1, d(j)._2); j += 1 }
      val next = RunState(idxs.result(), tools.result().toArray, maxTs)
      state.update(next)
      state.setTimeoutTimestamp(maxTs + idleTimeoutMs)
      Iterator.empty
    }
  }

  /** Wire the pattern matcher over a typed turn stream. Pre-filter the
    * stream to flagged turns BEFORE calling (only they carry state), but
    * declare the watermark UPSTREAM of the filter so unflagged traffic
    * still advances event time. Same timeout contract as
    * [[CsrState.attach]]: EventTimeTimeout fires one batch after the
    * watermark advances, and `idleTimeout` must exceed the conversation
    * event span plus any batch-split watermark jump.
    */
  def attach(flagged: Dataset[Turn], minLen: Int = 2,
             idleTimeout: String = "48 hours"): Dataset[RunMatch] = {
    implicit val stateEnc = Encoders.product[RunState]
    implicit val outEnc = Encoders.product[RunMatch]
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(idleTimeout))
    val timeoutMs = iv.months * 2592000000L + iv.days * 86400000L +
      iv.microseconds / 1000L
    flagged
      .groupByKey(_.conv_id)(Encoders.STRING)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(minLen, timeoutMs))
  }
}
