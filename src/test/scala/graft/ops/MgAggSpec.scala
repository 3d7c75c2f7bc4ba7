package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the imperative Misra-Gries aggregate ([[graft.functions.MgSketchAgg]],
  * the r07 batch-path replacement inside [[HeavyHitters.terms]]) against
  * the typed [[MisraGries]] Aggregator it superseded: identical sketch
  * content in the exact regime across the partial/merge path, and
  * step-identical eviction on a single-partition adversarial stream
  * (multi-partition eviction content is merge-order-dependent for BOTH
  * implementations, so only the order-free regimes pin equality; the MG
  * error bounds for the imperative path ride on HeavyHittersSpec, which
  * now exercises it through terms()).
  */
class MgAggSpec extends SparkSuite {
  import spark.implicits._

  private def typedHits(rows: Seq[(String, String)], capacity: Int,
                        parts: Int) = {
    val items = rows.toDF("g", "item").repartition(parts)
      .as[(String, String)]
    items.groupByKey(_._1).mapValues(_._2)
      .agg(new MisraGries(capacity).toColumn.name("hits"))
      .toDF("g", "hits")
      .select(col("g"), explode(col("hits")).as("h"))
      .select(col("g"), col("h.item").as("term"), col("h.cnt").as("cnt"))
  }

  private def imperativeHits(rows: Seq[(String, String)], capacity: Int,
                             parts: Int) =
    rows.toDF("g", "item").repartition(parts)
      .groupBy("g")
      .agg(graft.functions.MgAgg.mg_sketch(col("item"), capacity).as("hits"))
      .select(col("g"), explode(col("hits")).as("h"))
      .select(col("g"), col("h.item").as("term"), col("h.cnt").as("cnt"))

  test("exact regime: imperative == typed across a multi-partition merge path") {
    val rows = (0 until 2000).flatMap { i =>
      val g = s"g${i % 3}"
      Seq(g -> s"w${i % 7}", g -> s"w${(i * 13) % 11}")
    }
    val t = typedHits(rows, capacity = 16, parts = 7)
    val f = imperativeHits(rows, capacity = 16, parts = 7)
    assert(f.exceptAll(t).isEmpty && t.exceptAll(f).isEmpty)
    // exact regime really is exact: equal to the plain count
    val plain = rows.toDF("g", "term").groupBy("g", "term")
      .agg(count(lit(1)).as("cnt"))
    assert(f.exceptAll(plain).isEmpty && plain.exceptAll(f).isEmpty)
  }

  test("eviction steps are identical on a single-partition adversarial stream") {
    // vocabulary (27 distinct) far beyond capacity 4: every decrement /
    // no-insert step fires; single partition makes the step sequence
    // deterministic and identical for both implementations
    val rows = (0 until 600).map { i =>
      val w = if (i % 3 == 0) "heavy" else s"rare${i % 26}"
      "g" -> w
    }
    val t = typedHits(rows, capacity = 4, parts = 1).orderBy("term")
      .as[(String, String, Long)].collect().toSeq
    val f = imperativeHits(rows, capacity = 4, parts = 1).orderBy("term")
      .as[(String, String, Long)].collect().toSeq
    assert(t == f && t.nonEmpty)
    assert(f.exists(_._2 == "heavy"))
  }

  test("rank order (cnt desc, term asc) and the survivor set match typed finish") {
    val rows = Seq("a" -> "x", "a" -> "x", "a" -> "y", "a" -> "y",
                   "a" -> "z", "a" -> "w")
    val f = rows.toDF("g", "item").coalesce(1)
      .groupBy("g")
      .agg(graft.functions.MgAgg.mg_sketch(col("item"), 8).as("hits"))
      .select(posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col("pos"), col("h.item").as("term"), col("h.cnt").as("cnt"))
      .orderBy("pos")
      .as[(Int, String, Long)].collect().toSeq
    assert(f == Seq((0, "x", 2L), (1, "y", 2L), (2, "w", 1L), (3, "z", 1L)))
  }
}
