package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the InternalRow imperative top-k aggregate
  * ([[graft.functions.TopKByScoreAgg]], the r07 hot-path replacement)
  * against the typed Aggregator it superseded ([[graft.ops.TopKByScore]])
  * and against its documented contract: identical (key desc, id asc)
  * ordering, NaN keys dropped, partial/merge path equal to a global sort.
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  private def scored(rows: Seq[(Long, Long, Double, Double)]) =
    rows.toDF("query_id", "nbr_id", "key", "sim")

  test("imperative agg == typed Aggregator on a multi-partition input") {
    val rows = (0 until 500).map { i =>
      val q = (i % 7).toLong
      val key = ((i * 2654435761L) % 1000) / 997.0
      (q, i.toLong, key, key + 0.5)
    }
    val df = scored(rows).repartition(6)
    val fast = Knn.topKExplode(df, 5)
    val slow = df.as[graft.ops.ScoredRow]
      .groupByKey(_.query_id)
      .agg(new graft.ops.TopKByScore(5).toColumn.name("top"))
      .select(col("key").as("query_id"),
              posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.nbr_id").as("nbr_id"),
              col("e.sim").as("sim"), (col("pos") + 1).cast("int").as("rank"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() == slow.count() && fast.count() > 0)
  }

  test("NaN keys never rank; ties break by ascending id") {
    val df = scored(Seq(
      (1L, 10L, Double.NaN, 9.0),
      (1L, 4L, 0.5, 1.0), (1L, 3L, 0.5, 2.0), (1L, 2L, 0.5, 3.0),
      (1L, 9L, 0.7, 4.0), (1L, 8L, 0.1, 5.0))).repartition(3)
    val out = Knn.topKExplode(df, 3).orderBy("rank")
      .select("nbr_id", "rank").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((9L, 1), (2L, 2), (3L, 3)))
  }

  test("fewer rows than k yields all rows, rank-ordered") {
    val df = scored(Seq((1L, 2L, 0.3, 0.3), (1L, 1L, 0.9, 0.9)))
    val out = Knn.topKExplode(df, 5).orderBy("rank")
      .select("nbr_id", "rank").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 1), (2L, 2)))
  }
}
