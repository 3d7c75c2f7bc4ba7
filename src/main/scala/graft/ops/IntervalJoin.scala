package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment join: attach to every point row the keyed
  * interval that contains its timestamp — the relational form of the
  * reference's coordinate-to-interval assignment during
  * split-on-alignment (builders.py:302-430: each alignment coordinate is
  * located inside one of a segment's breakpoint intervals).
  *
  * The naive plan (`p JOIN i ON key AND p.t BETWEEN i.s AND i.e`) has no
  * equi-condition beyond the key, so the join degenerates to a per-key
  * cartesian — O(points × intervals) per key, the classic range-join
  * trap. This operator BUCKETIZES instead: each interval explodes into
  * the coarse time buckets it covers (`sequence` over `date_trunc`d
  * bounds), points bucket by `date_trunc(pointTime)`, and the join is an
  * EQUI-join on (keys…, bucket) with the BETWEEN as a residual filter —
  * one hash shuffle, fan-out bounded by interval-span/bucketWidth. Pick
  * `bucket` ≳ the typical interval span so most intervals land in 1-2
  * buckets (Spark's `sequence` caps elements per row, so a bucket far
  * smaller than the span fails loudly, not silently).
  *
  * Contract: interval columns (`start`, `end`, `payload`) must not
  * collide with point column names — they become the appended output
  * columns. Intervals of one key must be non-overlapping if a unique
  * match is expected (the session/breakpoint shape); otherwise each
  * containing interval produces a row. Inner-join semantics: points
  * outside every interval are dropped.
  */
object IntervalJoin {

  def containment(points: DataFrame,
                  intervals: DataFrame,
                  keys: Seq[String],
                  pointTime: String,
                  start: String,
                  end: String,
                  payload: Seq[String],
                  bucket: String = "hour"): DataFrame = {
    require(keys.nonEmpty, "containment join needs at least one key column")
    // enforce the documented no-collision contract (AsOfJoin.asOf has the
    // same guard): a colliding appended column would otherwise surface as
    // an ambiguous-reference analysis error deep inside the join
    val appended = ((start +: end +: payload).distinct :+ "__ij_b") ++
      keys.map(k => s"__ij_$k")
    val clash = appended.filter(points.columns.contains)
    require(clash.isEmpty,
      s"interval columns collide with point columns: ${clash.mkString(", ")}")
    // interval side under renamed keys: unique names keep the join
    // unambiguous even when `intervals` derives from `points` (the usual
    // self-derived sessions/breakpoints shape)
    val iv = intervals.select(
        keys.map(k => col(k).as(s"__ij_$k")) ++
          (start +: end +: payload).distinct.map(col): _*)
      .withColumn("__ij_b",
        explode(sequence(date_trunc(bucket, col(start)),
                         date_trunc(bucket, col(end)),
                         expr(s"INTERVAL 1 $bucket"))))
    val cond = keys.map(k => col(k) === col(s"__ij_$k")).reduce(_ && _) &&
      date_trunc(bucket, col(pointTime)) === col("__ij_b") &&
      col(pointTime) >= col(start) && col(pointTime) <= col(end)
    points.join(iv, cond)
      .drop("__ij_b")
      .drop(keys.map(k => s"__ij_$k"): _*)
  }
}
