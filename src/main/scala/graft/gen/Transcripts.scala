package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic transcript (Turn) table, derived from the driver's
  * `events.parquet` by a pure, engine-agnostic transformation.
  *
  * The SAME derivation is expressed twice — once in the Spark Column DSL
  * ([[turns]]) and once as a DuckDB CTE ([[sqlCte]]) — so that every
  * transcript query in [[graft.SparkEntry]] can be verified row-for-row by
  * the driver's DuckDB oracle. Any change here MUST be applied to both.
  *
  * Mapping (one event row → one turn, bijective and order-stable):
  *   - conv_id  = "c<user_id>d<yyyyMMdd(ts)>"  — a conversation is one
  *                user-day (the GFA path-name analog, parser.py:33-39)
  *   - turn_idx = dense 0-based rank by (ts, event_id) within the
  *                conversation (segment order in a P record,
  *                parser.py:234-245); event_id is unique → deterministic
  *   - role     = user/assistant alternating by turn parity (orientation
  *                analog, parser.py:27-28)
  *   - text     = event_type # props — the per-turn payload subject to the
  *                byte-equality invariant (sequence analog, parser.py:16)
  *   - tool     = event_type for error/purchase turns, else null (typed
  *                tag analog, parser.py:179-204)
  *   - ts       = event ts (event-time / watermark column)
  */
object Transcripts {

  /** Columns of the canonical Turn table, in contract order. */
  val columns: Seq[String] =
    Seq("conv_id", "turn_idx", "role", "text", "tool", "ts")

  /** The Turn table for one scale-factor directory. Narrow ops only until
    * the single rank shuffle on conv_id — at 100 TB this is one shuffle of
    * the bare (key, ts, event_id) projection; everything downstream reuses
    * the conv_id clustering.
    */
  def turns(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(spark.read.parquet(s"$sfDir/events.parquet"))

  /** Same derivation over an arbitrary events-shaped DataFrame
    * (event_id:long, ts:timestamp, user_id:long, event_type:string,
    * value:double, props:string).
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val convId =
      concat(lit("c"), col("user_id").cast("string"),
             lit("d"), date_format(col("ts"), "yyyyMMdd"))
    val w = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(
        convId.as("conv_id"),
        col("ts"),
        col("event_id"),
        col("event_type"),
        col("props"))
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        col("conv_id"),
        col("turn_idx"),
        when(col("turn_idx") % 2 === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        concat(col("event_type"), lit("#"), col("props")).as("text"),
        when(col("event_type").isin("error", "purchase"), col("event_type"))
          .as("tool"),
        col("ts"))
  }

  /** DuckDB-dialect CTE producing the identical `turns` relation from the
    * `events` view. Prefix for every transcript oracle query:
    * `sql("SELECT ... FROM turns ...")`.
    */
  val sqlCte: String =
    """WITH numbered AS (
      |  SELECT 'c' || CAST(user_id AS VARCHAR) || 'd' || strftime(ts, '%Y%m%d') AS conv_id,
      |         ts, event_id, event_type, props
      |  FROM events
      |), turns AS (
      |  SELECT conv_id,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
      |         CASE WHEN (ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1) % 2 = 0
      |              THEN 'user' ELSE 'assistant' END AS role,
      |         event_type || '#' || props AS text,
      |         CASE WHEN event_type IN ('error','purchase') THEN event_type END AS tool,
      |         ts
      |  FROM numbered
      |)""".stripMargin

  /** Wrap a `SELECT ... FROM turns ...` body with the canonical CTE. */
  def sql(body: String): String = s"$sqlCte\n$body"

  /** Same wrap with WITH RECURSIVE, for oracle bodies containing
    * recursive CTEs (DuckDB requires the keyword on the WITH that opens
    * the whole chain).
    */
  def sqlRecursive(body: String): String =
    s"WITH RECURSIVE ${sqlCte.stripPrefix("WITH ")}\n$body"
}
