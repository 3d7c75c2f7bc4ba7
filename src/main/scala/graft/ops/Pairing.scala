package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User↔assistant turn pairing — the batch formulation of the stateful
  * stream-stream join (J6/T5; GFA analog: a Link connecting consecutive
  * oriented segments, parser.py:21-30). The streaming twin with watermarks
  * and a time-range condition lives in [[graft.stream.CepQueries]]; this
  * batch plan is its parity oracle.
  */
object Pairing {

  /** Each user turn joined to the immediately following assistant turn of
    * the same conversation. Equi-join on (conv_id, turn_idx+1) — shuffles
    * both sides on the same key; with AQE this becomes a skew-tolerant
    * sort-merge join, and both sides are already clustered by conv_id when
    * fed from the canonical derivation.
    */
  def userAssistant(turns: DataFrame, maxGapSec: Long = 31536000L): DataFrame = {
    val u = turns.where(col("role") === "user")
      .select(col("conv_id"), col("turn_idx").as("user_idx"),
              col("text").as("user_text"), col("ts").as("user_ts"))
    // the adjacency condition is precomputed into the join key so the
    // full (conv_id, user_idx) pair is the equi-key — joining on conv_id
    // alone would nested-loop within hot conversations, and the
    // u("conv_id") === a("conv_id") dataframe-column form compiles to a
    // trivially-true self-equality only rescued by Spark 4's dataset-id
    // disambiguation (fragile across optimizer changes)
    val a = turns.where(col("role") === "assistant")
      .select(col("conv_id"), (col("turn_idx") - 1).as("user_idx"),
              col("turn_idx").as("asst_idx"),
              col("text").as("asst_text"), col("ts").as("asst_ts"))
    val joined = u.join(a, Seq("conv_id", "user_idx"), "inner")
    joined.select(
      col("conv_id"), col("user_idx"), col("asst_idx"),
      expr("timestampdiff(MICROSECOND, user_ts, asst_ts)").as("latency_us"))
      .where(col("latency_us") <= maxGapSec * 1000000L && col("latency_us") >= 0)
  }
}
