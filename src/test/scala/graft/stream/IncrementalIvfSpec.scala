package graft.stream

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Contracts for incremental IVF maintenance: streamed batch deltas
  * reproduce the one-shot assignment, crash replay rewrites identical
  * content, argmax ties resolve to the lowest cluster id, and the
  * maintained lists are searchable together with the base snapshot.
  */
class IncrementalIvfSpec extends SparkSuite {
  import spark.implicits._

  private def vec(seed: Int) =
    Array.tabulate(8)(d => ((seed * 31 + d * 7) % 13 - 6).toFloat).toSeq

  private val centroids = Seq(
    (1, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (2, Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (3, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))) // duplicate of 1 → tie
    .toDF("cluster_id", "centroid")

  test("two streamed batches equal the one-shot assignment; replay is idempotent") {
    val all = (0L until 20L).map(i => (i, vec(i.toInt)))
    val root = java.nio.file.Files.createTempDirectory("inc_ivf").toString
    val (b1, b2) = all.splitAt(10)
    IncrementalIvf.processBatch(b1.toDF("vec_id", "embedding"), 0L,
                                centroids, s"$root/lists")
    IncrementalIvf.processBatch(b2.toDF("vec_id", "embedding"), 1L,
                                centroids, s"$root/lists")
    val streamed = IncrementalIvf.deltas(spark, s"$root/lists")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    val oneShot = IncrementalIvf.assignRounded(
        all.toDF("vec_id", "embedding"), centroids)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(streamed.toSeq == oneShot.toSeq)
    // crash replay: re-running batch 0 leaves the relation unchanged
    IncrementalIvf.processBatch(b1.toDF("vec_id", "embedding"), 0L,
                                centroids, s"$root/lists")
    val replayed = IncrementalIvf.deltas(spark, s"$root/lists")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(replayed.toSeq == streamed.toSeq)
  }

  test("argmax ties resolve to the lowest cluster id") {
    val out = IncrementalIvf.assignRounded(
        Seq((7L, Seq(2f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
          .toDF("vec_id", "embedding"), centroids)
      .as[(Long, Int, Double)].collect()
    // centroids 1 and 3 are identical — the winner must be cluster 1
    assert(out.toSeq == Seq((7L, 1, 1.0)))
  }

  test("maintained deltas search together with base lists") {
    val base = (100L until 120L).map(i => (i, vec(i.toInt)))
    val grown = (0L until 10L).map(i => (i, vec(i.toInt)))
    val root = java.nio.file.Files.createTempDirectory("inc_ivf2").toString
    val baseDf = base.toDF("vec_id", "embedding")
    val cents = graft.sim.Ivf.trainCentroids(baseDf, nClusters = 4,
                                             iters = 2, sampleFactor = 25)
    val baseLists = graft.sim.Ivf.invertedLists(baseDf, cents)
    IncrementalIvf.processBatch(grown.toDF("vec_id", "embedding"), 0L,
                                cents, s"$root/lists")
    val lists = baseLists.unionByName(
      IncrementalIvf.deltas(spark, s"$root/lists")
        .select(col("id").as("nbr_id"), col("cluster_id")))
    val corpus = baseDf.unionByName(grown.toDF("vec_id", "embedding"))
    val hits = graft.sim.Ivf.ivfTopKWithLists(
        corpus, grown.toDF("vec_id", "embedding"), cents, lists, k = 3,
        nprobe = 4)
      .select("query_id", "nbr_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    // vec(seed) repeats every 13 seeds and base 100-119 covers every
    // residue class, so each grown query has an identical BASE twin:
    // rank 1 must be an exact match (self-pairs are excluded by the
    // kNN-graph convention — candidatePairs filters query_id = nbr_id)
    val rank1 = hits.filter(_._4 == 1)
    assert(rank1.length == grown.length &&
           rank1.forall(h => math.abs(h._3 - 1.0) < 1e-9),
      s"every query must find its identical twin at rank 1: ${rank1.toSeq}")
    // and the maintained DELTA members are themselves searchable
    // neighbors (grown ids < 100 appearing as nbr)
    assert(hits.exists(_._2 < 100L),
      "delta-list members never surfaced as neighbors")
  }
}
