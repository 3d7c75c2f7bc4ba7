package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts for GPT-style sequence packing: exact global token offsets
  * from the two-phase prefix sum (bucketed path ≡ the naive global
  * window), straddle detection, and the plan shape (the corpus-sized
  * window is bucket-partitioned, not global).
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def docsOf(tokens: Seq[Int]) =
    tokens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")

  test("offsets are exact cumulative sums and straddles are flagged") {
    // tokens 4,5,3,6 with budget 8: offsets 0,4,9,12
    // doc0 [0,3] seq 0; doc1 [4,8] straddles 0->1; doc2 [9,11] seq 1;
    // doc3 [12,17] straddles 1->2
    val out = Packing.packOffsets(docsOf(Seq(4, 5, 3, 6)), budget = 8)
      .as[(Long, Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 4, 0L, 0, 0),
      (1L, 5, 4L, 0, 1),
      (2L, 3, 9L, 1, 1),
      (3L, 6, 12L, 1, 2)))
  }

  test("two-phase bucketed prefix sum equals the single-bucket result") {
    val tokens = Seq.tabulate(97)(i => 1 + (i * 7) % 13)
    val docs = docsOf(tokens)
    val a = Packing.packOffsets(docs, budget = 32, bucketSize = 10)
      .as[(Long, Int, Long, Int, Int)].collect().sortBy(_._1)
    val b = Packing.packOffsets(docs, budget = 32, bucketSize = 1L << 20)
      .as[(Long, Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // spot-check the global invariant: offset(i) = sum of tokens below i
    assert(a.map(_._3).toSeq == tokens.scanLeft(0L)(_ + _).init)
  }

  test("corpus-sized window is bucket-partitioned in the plan") {
    val df = Packing.packOffsets(docsOf(Seq.fill(50)(3)), budget = 16,
      bucketSize = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    // the per-doc window must carry the bucket partition key; the only
    // partition-less window is the per-BUCKET one
    assert("windowspecdefinition\\(bucket#\\d+L, doc_id".r
        .findFirstIn(finalPlan).isDefined,
      s"expected a bucket-partitioned per-doc window:\n$finalPlan")
  }

  test("non-contiguous ids still pack by ascending id") {
    val docs = Seq((5L, "a b c"), (100L, "d e"), (3L, "f"))
      .toDF("doc_id", "text")
    val out = Packing.packOffsets(docs, budget = 4, bucketSize = 10)
      .as[(Long, Int, Long, Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (3L, 1, 0L, 0, 0), (5L, 3, 1L, 0, 0), (100L, 2, 4L, 1, 1)))
  }
}
