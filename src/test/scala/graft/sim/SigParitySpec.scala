package graft.sim

import graft.SparkSuite
import graft.text.{Dedup, TextAnalysis}

/** The from-signatures (materialized post-hash) entry points must be
  * row-identical to their inline one-shot twins — the contract that lets
  * the driver queries compute from OracleSig parquet while DedupSpec /
  * KnnSpec keep pinning the inline pipelines. One path additionally
  * round-trips its signature tables through parquet, the exact
  * materialization shape the oracle reads.
  */
class SigParitySpec extends SparkSuite {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString).sorted.toSeq

  test("minhashRankedFrom over parquet-round-tripped tables == minhashRanked") {
    val tmp = java.nio.file.Files.createTempDirectory("sig_parity").toString
    val sh0 = Dedup.shingleTable(docs)
    val bands0 = Dedup.minhashBands(sh0)
    sh0.write.parquet(s"$tmp/sh")
    bands0.write.parquet(s"$tmp/bands")
    val sh = spark.read.parquet(s"$tmp/sh")
    val bands = spark.read.parquet(s"$tmp/bands")
    assert(rows(Dedup.minhashRankedFrom(sh, bands)) ==
           rows(Dedup.minhashRanked(docs)))
  }

  test("simhashNearDupsFrom(simhash) == simhashNearDups") {
    assert(rows(Dedup.simhashNearDupsFrom(Dedup.simhash(docs), maxHamming = 16)) ==
           rows(Dedup.simhashNearDups(docs, maxHamming = 16)))
  }

  test("lshTopKFromSigs(lshSignatures) == lshTopK on the self-kNN workload") {
    val sigs = Knn.lshSignatures(emb)
    assert(rows(Knn.lshTopKFromSigs(emb, sigs, 3, simDecimals = 6)
                  .select("query_id", "nbr_id", "rank")) ==
           rows(Knn.lshTopK(emb, emb, 3, simDecimals = 6)
                  .select("query_id", "nbr_id", "rank")))
  }

  test("embeddingNearDupsFromSigs == embeddingNearDups") {
    val sigs = Knn.lshSignatures(emb)
    assert(rows(Dedup.embeddingNearDupsFromSigs(emb, sigs, threshold = -1.0)) ==
           rows(Dedup.embeddingNearDups(emb, threshold = -1.0)))
  }

  test("winnowFromGrams(gramHashes) == winnowedFingerprints") {
    assert(rows(TextAnalysis.winnowFromGrams(docs, TextAnalysis.gramHashes(docs))) ==
           rows(TextAnalysis.winnowedFingerprints(docs)))
  }

  test("ivfTopKWithLists(precomputed lists) == ivfTopKWith") {
    val cents = Ivf.trainCentroids(emb, nClusters = 8, iters = 1,
                                   sampleFactor = 10)
    val lists = Ivf.invertedLists(emb, cents)
    assert(rows(Ivf.ivfTopKWithLists(emb, emb, cents, lists, 3,
                                     nprobe = 2, simDecimals = 6)
                  .select("query_id", "nbr_id", "rank")) ==
           rows(Ivf.ivfTopKWith(emb, emb, cents, 3, nprobe = 2,
                                simDecimals = 6)
                  .select("query_id", "nbr_id", "rank")))
  }
}
