package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Turn-rate aggregates — the event-time generalization of the reference's
  * count-based progress cadence (every 500k lines, builders.py:257-258).
  * Tumbling/sliding windows per tool/role; the CEP query #2 surface (T4).
  */
object Rates {

  /** Tumbling per-tool turn counts. Epoch-aligned windows so the DuckDB
    * oracle is a date_trunc/time_bucket group-by. Map-side combinable:
    * partial aggregation happens before the single shuffle.
    */
  def tumblingPerTool(turns: DataFrame, width: String = "1 hour"): DataFrame =
    turns
      .groupBy(window(col("ts"), width).as("w"), col("tool"))
      .agg(count(lit(1)).as("n_turns"),
           countDistinct("conv_id").as("n_convs"))
      .select(col("w.start").as("window_start"), col("tool"),
              col("n_turns"), col("n_convs"))

  /** Sliding windows (width, slide): each row contributes to
    * width/slide windows — the batch analog used in streaming parity tests.
    */
  def slidingPerRole(turns: DataFrame, width: String, slide: String): DataFrame =
    turns
      .groupBy(window(col("ts"), width, slide).as("w"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("w.start").as("window_start"), col("role"), col("n_turns"))

  /** cube(role, tool) rollup of turn counts + distinct conversations —
    * the A13 grouping-sets surface (free in both Spark and DuckDB).
    */
  def roleToolCube(turns: DataFrame): DataFrame =
    turns
      .cube(col("role"), col("tool"))
      .agg(count(lit(1)).as("n_turns"),
           countDistinct("conv_id").as("n_convs"),
           // grouping flags disambiguate "rollup-all" rows from genuine
           // null-valued groups (tool is nullable) for the oracle compare
           grouping(col("role")).cast("int").as("g_role"),
           grouping(col("tool")).cast("int").as("g_tool"))
}
