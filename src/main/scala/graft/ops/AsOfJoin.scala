package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (point-in-time) join: attach to every left row the
  * LATEST right row of the same key whose time is at-or-before (or, with
  * `strict`, strictly before) the left row's time — the temporal-lookup
  * operator the reference realizes per-path as "last segment seen at this
  * coordinate" during split-on-alignment rewiring (builders.py:302-430),
  * generalized to any keyed event table.
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l JOIN r ON key AND r.t <= l.t` + max-per-left) explodes into a
  * range join whose intermediate is O(|l|·|r|) per key. This operator
  * instead UNIONS the two sides with a side tag and takes a running
  * `last(payload, ignoreNulls)` over one (key)-partitioned (time, side)
  * sort — exactly ONE hash-partition+sort shuffle of the projected
  * columns, no intermediate blow-up, map-side-prunable, and skew-bounded
  * by the per-key row count (AQE skew split applies to the sort
  * exchange). At 100 TB this is the same cost shape as a windowed
  * aggregate over the union — the optimal distributed as-of plan.
  *
  * Contract: right rows must be unique per (keys, rightTime) — pre-reduce
  * duplicates (e.g. `groupBy(keys, time).agg(max(...))`) so the matched
  * row is deterministic. `rightTime` and `payload` column names must not
  * collide with left column names; they become the appended output
  * columns (null where no right row qualifies, or where the match is
  * older than `toleranceUs`).
  */
object AsOfJoin {

  def asOf(left: DataFrame,
           right: DataFrame,
           keys: Seq[String],
           leftTime: String,
           rightTime: String,
           payload: Seq[String],
           strict: Boolean = false,
           toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(payload.nonEmpty, "payload must name at least one right column")
    val fields = (rightTime +: payload).distinct
    // appended columns must not silently overwrite left columns
    val clash = fields.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right columns collide with left columns: ${clash.mkString(", ")} — " +
        "rename the right side before joining")
    val rightTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        struct(fields.map(col): _*).as("__asof_p")): _*)
    val leftTagged = left
      .withColumn("__asof_t", col(leftTime))
      .withColumn("__asof_side", lit(1))
    // at equal time, inclusive (>=) sorts the right row BEFORE the left
    // row so the running last sees it; strict (>) sorts it after
    val ord =
      if (strict) Seq(col("__asof_t").asc, col("__asof_side").desc)
      else Seq(col("__asof_t").asc, col("__asof_side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftTagged
      .unionByName(rightTagged, allowMissingColumns = true)
      .withColumn("__asof_m", last(col("__asof_p"), ignoreNulls = true).over(w))
      .where(col("__asof_side") === 1)
    val bounded = toleranceUs match {
      case Some(tol) => matched.withColumn("__asof_m",
        when(expr(s"timestampdiff(MICROSECOND, __asof_m.`$rightTime`, " +
               s"__asof_t)") <= tol,
             col("__asof_m")))
      case None => matched
    }
    payload.foldLeft(bounded) { (df, p) =>
      df.withColumn(p, col("__asof_m").getField(p))
    }.drop("__asof_t", "__asof_side", "__asof_p", "__asof_m")
  }
}
