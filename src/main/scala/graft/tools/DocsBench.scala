package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the training-data pipeline operators (the dedup /
  * funnel family only has sf-sized numbers otherwise): generates a
  * deterministic N-doc corpus FULLY DISTRIBUTED (no driver-side rows —
  * text is derived per-row from a seed id via xxhash64 word picks,
  * written once to parquet so every leg times the operators over a real
  * scan), then runs exact dedup, the MinHash near-dup pipeline, and the
  * end-to-end corpus-filter funnel, reporting docs/sec. One parallelism
  * leg per invocation (the [[Scaling]] convention — run at
  * GRAFT_DOCS_CPUS=8 and 32 for the N→4N pair).
  *
  * Knobs: GRAFT_DOCS_N (default 1,000,000), GRAFT_DOCS_CPUS (default 8),
  * GRAFT_DOCS_OUT (JSON line mirror, default /tmp/docsbench.json).
  *
  * Corpus structure (all by id arithmetic, so every leg sees identical
  * bytes): every 17th doc is a NEAR dup of its predecessor (same seed,
  * one extra token), every 23rd an EXACT dup (same seed, same text),
  * every 13th seed has no stopwords (fails the lang gate), every 19th
  * has 3 tokens (fails the quality gate); lengths vary 30-80 tokens.
  */
object DocsBench {

  private val stop = Seq("the", "a", "an", "and", "of", "to", "in", "is",
    "it", "that", "for", "on", "with", "as")
  private val content = Seq("graph", "segment", "stream", "window", "state",
    "shuffle", "partition", "cluster", "vector", "token", "corpus", "batch",
    "join", "hash", "filter", "spill", "codec", "buffer", "offset", "merge",
    "probe", "bucket", "record", "schema", "column", "metric", "replay",
    "commit", "horizon", "lineage", "index", "degree", "vertex", "edge")

  /** The deterministic corpus as a single select over spark.range(n). */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val vocab = array((stop ++ content).map(lit): _*)     // 48 words
    val vocabNoStop = array(content.map(lit): _*)         // lang-gate fail
    val df = spark.range(n).toDF("doc_id")
    val isNear = col("doc_id") % 17 === 0 && col("doc_id") > 0
    val isExact = !isNear && col("doc_id") % 23 === 0 && col("doc_id") > 0
    val seed = when(isNear || isExact, col("doc_id") - 1)
      .otherwise(col("doc_id"))
    val noStop = seed % 13 === 0
    val nTok = when(seed % 19 === 0, lit(3L))
      .otherwise(pmod(xxhash64(seed, lit(-1)), lit(51)) + 30)
    def words(v: org.apache.spark.sql.Column, size: Int) =
      transform(sequence(lit(1), nTok),
        i => element_at(v, (pmod(xxhash64(seed, i), lit(size)) + 1)
          .cast("int")))
    val baseText = array_join(
      when(noStop, words(vocabNoStop, content.length))
        .otherwise(words(vocab, stop.length + content.length)), " ")
    df.select(col("doc_id"),
      when(isNear, concat(baseText, lit(" trailing marker")))
        .otherwise(baseText).as("text"))
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_DOCS_N", "1000000").toLong
    val cpus = sys.env.getOrElse("GRAFT_DOCS_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-docsbench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"/tmp/graft_docsbench/$n"
    if (!new java.io.File(s"$path/_SUCCESS").exists())
      corpus(spark, n).write.mode("overwrite").parquet(path)
    val docs = spark.read.parquet(path)
    val (nd, tDedup) = time {
      graft.text.Dedup.exact(docs).where(col("n_docs") > 1).count()
    }
    val (np, tPairs) = time {
      graft.text.Dedup.minhashNearDups(docs, threshold = 0.5).count()
    }
    // end-to-end funnel INCLUDING its pair derivation (the memoized
    // shingle/signature tables persist from the pairs pass — the
    // amortized signatures-written-once production shape)
    val (funnelRows, tFunnel) = time {
      graft.text.CorpusFilter.funnel(docs,
          graft.text.Dedup.minhashNearDups(docs, threshold = 0.5))
        .orderBy("stage_idx").collect()
    }
    val stages = funnelRows.map(r =>
      s""""${r.getString(1)}":${r.getLong(2)}""").mkString("{", ",", "}")
    // curation family (round 5): decontamination against a ~n/211-doc
    // benchmark slice (eval sets are orders of magnitude smaller than
    // the corpus — the broadcast-side contract), the stratified split
    // over 7 synthetic source strata (~n/7-row hot-stratum windows),
    // and the repetition features (full token explode + two aggs)
    val strat = docs.withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(7))))
    val (nContam, tDecon) = time {
      graft.text.Curation.decontaminate(
        docs.where(col("doc_id") % 211 =!= 7),
        docs.where(col("doc_id") % 211 === 7), n = 8).count()
    }
    val (nVal, tSplit) = time {
      graft.text.Curation.stratifiedSplit(strat)
        .where(col("split") === "val").count()
    }
    val (nRep, tRep) = time {
      graft.text.Curation.repetition(docs)
        .where(col("is_repetitive")).count()
    }
    // sequence packing: 2048-token cuts, 16k-id buckets (61 buckets at
    // 1M docs — the two-phase path, not the degenerate single bucket)
    val (nStraddle, tPack) = time {
      graft.text.Packing.packOffsets(docs, budget = 2048, bucketSize = 16384)
        .where(col("seq_first") =!= col("seq_last")).count()
    }
    val json =
      f"""{"bench":"docs","n":$n,"cpus":$cpus,"dedup_sec":$tDedup%.2f,
         |"dedup_docs_per_sec":${(n / tDedup).toLong},"pairs_sec":$tPairs%.2f,
         |"pairs_docs_per_sec":${(n / tPairs).toLong},"funnel_sec":$tFunnel%.2f,
         |"funnel_docs_per_sec":${(n / tFunnel).toLong},"dup_groups":$nd,
         |"neardup_pairs":$np,"funnel":$stages,
         |"decontam_sec":$tDecon%.2f,"decontam_docs_per_sec":${(n / tDecon).toLong},
         |"contaminated":$nContam,
         |"split_sec":$tSplit%.2f,"split_docs_per_sec":${(n / tSplit).toLong},
         |"val_docs":$nVal,
         |"repetition_sec":$tRep%.2f,"repetition_docs_per_sec":${(n / tRep).toLong},
         |"repetitive_docs":$nRep,
         |"pack_sec":$tPack%.2f,"pack_docs_per_sec":${(n / tPack).toLong},
         |"straddling_docs":$nStraddle}"""
        .stripMargin.replace("\n", "")
    println(json)
    val out = sys.env.getOrElse("GRAFT_DOCS_OUT", "/tmp/docsbench.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
