package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Conversation session segmentation — the transcript reinterpretation of
  * split-on-alignment (reference: builders.py:302-430): a conversation is
  * split at inactivity gaps > `gapSec`, yielding sub-conversations the way
  * alignment breakpoints yield sub-segments.
  *
  * Two equivalent formulations are provided and tested against each other:
  *   - [[byGap]]: the "gaps and islands" window formulation — pure ANSI
  *     SQL, hence DuckDB-oracle-checkable, and the batch parity reference.
  *   - [[bySessionWindow]]: Spark's native `session_window`, the streaming
  *     formulation used by [[graft.stream.CepQueries]].
  */
object Sessions {

  /** One row per (conv_id, session): session_idx is 0-based in turn order.
    * Single shuffle on conv_id; the two windows and the final aggregate
    * share the same partitioning, so Catalyst plans exactly one exchange.
    */
  def byGap(turns: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val flagged = turns
      .select(col("conv_id"), col("turn_idx"), col("ts"))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull ||
               expr(s"timestampdiff(MICROSECOND, prev_ts, ts)") > gapSec * 1000000L,
             lit(1)).otherwise(lit(0)))
      .withColumn("session_idx",
        (sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
          .cast("int"))
    flagged.groupBy("conv_id", "session_idx").agg(
      count(lit(1)).as("n_turns"),
      min("turn_idx").as("first_turn"),
      max("turn_idx").as("last_turn"),
      min("ts").as("start_ts"),
      max("ts").as("end_ts"))
  }

  /** DuckDB islands CTEs shared by the [[byGap]] and [[bySessionWindow]]
    * oracles (appended after the canonical `turns` CTE).
    */
  def islandsCte(gapSec: Long, strictBoundary: Boolean = false,
                 where: String = ""): String = {
    // session_window(ts, gap) spans [ts, ts+gap): an event exactly `gap`
    // later falls outside and opens a NEW session (>=); the byGap islands
    // op keeps an exact-gap event in the SAME session (>). The oracle must
    // match the op it verifies. `where` (a full "WHERE ..." clause or "")
    // restricts the turns base in lockstep with a restricted Spark input.
    val cmp = if (strictBoundary) ">=" else ">"
    s""", flagged AS (
       |  SELECT conv_id, turn_idx, ts,
       |         CASE WHEN LAG(ts) OVER w IS NULL
       |                OR date_diff('microsecond', LAG(ts) OVER w, ts) $cmp ${gapSec * 1000000L}
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM turns $where
       |  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
       |), numbered_sessions AS (
       |  SELECT conv_id, turn_idx, ts,
       |         CAST(SUM(new_session) OVER (PARTITION BY conv_id ORDER BY turn_idx
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS INTEGER) AS session_idx
       |  FROM flagged
       |)""".stripMargin
  }

  /** DuckDB oracle for [[byGap]]. */
  def byGapOracle(gapSec: Long): String =
    islandsCte(gapSec) +
      """
        |SELECT conv_id, session_idx, COUNT(*) AS n_turns,
        |       MIN(turn_idx) AS first_turn, MAX(turn_idx) AS last_turn,
        |       MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |FROM numbered_sessions GROUP BY conv_id, session_idx""".stripMargin

  /** DuckDB oracle for [[bySessionWindow]] (same islands, projection
    * matching the session_window aggregate's columns).
    */
  def sessionWindowOracle(gapSec: Long, where: String = ""): String =
    islandsCte(gapSec, strictBoundary = true, where) +
      """
        |SELECT conv_id, COUNT(*) AS n_turns, MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |FROM numbered_sessions GROUP BY conv_id, session_idx""".stripMargin

  /** Native session_window formulation (event-time gap sessions). Batch
    * callers get the same (conv_id, n_turns, start_ts, end_ts) multiset as
    * [[byGap]] when turn order is ts order (verified by SessionsSpec).
    */
  def bySessionWindow(turns: DataFrame, gap: String): DataFrame =
    turns
      .groupBy(col("conv_id"), session_window(col("ts"), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_turns"),
        min("ts").as("start_ts"),
        max("ts").as("end_ts"))
      .select("conv_id", "n_turns", "start_ts", "end_ts")
}
