package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.schema.Turn

/** Pins the imperative CSR-shape aggregate ([[graft.functions.CsrShapeAgg]],
  * the r07 q_csr_agg replacement) row-for-row against the typed
  * [[ConvCsrAggregator]] it superseded: same csrOf derivation, same
  * duplicate handling, same empty/singleton edge values, across the
  * partial/merge path of a multi-partition input.
  */
class CsrAggSpec extends SparkSuite {
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def turns(rows: Seq[(String, Int)]) =
    rows.map { case (c, i) => Turn(c, i, "user", s"t$i", None, ts0) }

  private def typedOut(rows: Seq[Turn]) =
    spark.createDataset(rows)
      .groupByKey(_.conv_id)
      .agg(ConvCsrAggregator.toColumn.name("csr"))
      .select(col("key").as("conv_id"), col("csr.n_turns"), col("csr.n_edges"),
              col("csr.min_idx"), col("csr.max_idx"), col("csr.contiguous"))

  private def imperativeOut(rows: Seq[Turn]) =
    spark.createDataset(rows).toDF().repartition(5)
      .groupBy("conv_id")
      .agg(graft.functions.CsrAgg.csr_shape(col("turn_idx")).as("csr"))
      .select(col("conv_id"), col("csr.n_turns"), col("csr.n_edges"),
              col("csr.min_idx"), col("csr.max_idx"), col("csr.contiguous"))

  test("imperative agg == typed Aggregator: gaps, duplicates, singletons, multi-partition merge") {
    // conv a: contiguous 0..9 with replays; conv b: gapped islands;
    // conv c: singleton; conv d: dense run + isolated tail
    val rows = turns(
      (0 until 20).map(i => ("a", i % 10)) ++
      Seq(("b", 3), ("b", 4), ("b", 9), ("b", 11), ("b", 12), ("b", 12)) ++
      Seq(("c", 7)) ++
      ((100 until 140).map(i => ("d", i)) :+ ("d", 500)))
    val t = typedOut(rows)
    val f = imperativeOut(rows)
    assert(f.exceptAll(t).isEmpty && t.exceptAll(f).isEmpty)
    assert(f.count() == 4)
  }

  test("5k-turn hot conversation with duplicates (the skewed-generator shape)") {
    val rows = (0 until 5000).map(i =>
      Turn("hot", i % 2500, "user", s"t$i", None, ts0))
    val out = imperativeOut(rows)
      .select("n_turns", "n_edges", "min_idx", "max_idx", "contiguous").head()
    assert(out.getInt(0) == 2500 && out.getInt(1) == 2499 &&
           out.getInt(2) == 0 && out.getInt(3) == 2499 && out.getBoolean(4))
  }
}
