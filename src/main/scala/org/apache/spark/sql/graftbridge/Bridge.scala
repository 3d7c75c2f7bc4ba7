package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the Column ↔ Catalyst Expression conversion, which
  * Spark 4 keeps `private[sql]` (classic.ExpressionUtils). Lives inside the
  * org.apache.spark.sql package solely to re-export those two calls for
  * graft's custom expressions — standard practice for libraries shipping
  * native Catalyst expressions against the classic API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebuild a DataFrame as a fresh leaf over an already-materialized
    * plan's InternalRow RDD, DROPPING inherited statistics.
    *
    * Dataset.localCheckpoint preserves the checkpointed plan's size
    * estimate on the resulting LogicalRDD; an iterative kernel that
    * self-joins its state every round then SQUARES that estimate per
    * round — double-exponential growth that overflows BigInteger in the
    * size-only stats visitor after ~30 rounds. The fresh leaf restores
    * default stats (no broadcast misplans either — iterative state joins
    * are shuffle joins by design). Call on a checkpointed Dataset so
    * `toRdd` is the materialized RDD, not a recompute.
    */
  def freshLeaf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
}
