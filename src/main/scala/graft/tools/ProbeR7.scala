package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 phase probe (guide §1.4): isolates the component costs of the
  * bench's hottest queries with the noop sink so the optimization targets
  * the real spender, not the query label. Each phase is labelled via
  * setJobDescription and timed min-of-N.
  */
object ProbeR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-42s min=${ts.min}%7.3f max=${ts.max}%7.3f")
    }

    // warmup
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    graft.gen.Transcripts.turns(spark, sfDir).limit(1000).count()

    val only: Set[String] = args.toSet
    def want(k: String) = only.isEmpty || only.contains(k)

    if (want("base")) {
      time("events_scan_noop") {
        noop(spark.read.parquet(s"$sfDir/events.parquet"))
      }
      time("turns_noop") {
        noop(graft.gen.Transcripts.turns(spark, sfDir))
      }
      time("streamfeed_collect") {
        graft.gen.Transcripts.fromEvents(
            spark.read.parquet(s"$sfDir/events.parquet")
              .where(col("user_id") < 10))
          .where(col("ts").isNotNull)
          .withColumn("ts", col("ts").cast("timestamp"))
          .as[graft.schema.Turn].collect()
      }
      time("docs_scan_noop") {
        noop(spark.read.parquet(s"$sfDir/documents.parquet"))
      }
      time("emb_scan_noop") {
        noop(spark.read.parquet(s"$sfDir/embeddings.parquet"))
      }
    }

    if (want("knn")) {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println(s"[probe] emb rows=${e.count()} dim=" +
        e.select(size(col("embedding"))).head().getInt(0))
      time("knn_norms_noop") {
        noop(e.select(col("vec_id"),
          sqrt(graft.functions.VecFunctions.vec_dot(col("embedding"),
                                                    col("embedding"))).as("n")))
      }
      time("knn_brute_full") {
        noop(graft.sim.Knn.bruteTopK(e, e, 5, simDecimals = 6)
          .select("query_id", "nbr_id", "rank"))
      }
      time("knn_brute_fallback4096") {
        val prev = spark.conf.getOption(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        spark.conf.set(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
        try noop(graft.sim.Knn.bruteTopK(e, e, 5, simDecimals = 6)
          .select("query_id", "nbr_id", "rank"))
        finally prev match {
          case Some(v) => spark.conf.set(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
          case None => spark.conf.unset(
            "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        }
      }
      // pair volume without the typed aggregator: raw NLJ + sim compute,
      // reduced by an untyped min — isolates the Aggregator + encoder cost
      time("knn_pairs_simonly") {
        val c = e.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_vec"))
          .withColumn("nbr_norm", sqrt(graft.functions.VecFunctions.vec_dot(col("nbr_vec"), col("nbr_vec"))))
        val q = e.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
          .withColumn("q_norm", sqrt(graft.functions.VecFunctions.vec_dot(col("q_vec"), col("q_vec"))))
        val sim = (graft.functions.VecFunctions.vec_dot(col("q_vec"), col("nbr_vec")) /
          (col("q_norm") * col("nbr_norm"))).as("sim")
        noop(c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
          .select(col("query_id"), col("nbr_id"), sim)
          .groupBy("query_id").agg(max("sim"), min("nbr_id")))
      }
    }

    if (want("cc")) {
      // overlap-graph construction vs the component loop
      val base = graft.gen.Transcripts.fromEvents(
        spark.read.parquet(s"$sfDir/events.parquet")
          .where(col("user_id").isin(0L, 1L)))
      val ct = graft.ops.Overlap.convText(base, graft.ops.Overlap.DefaultMaxDf)
      println(s"[probe] overlap ct rows=${ct.count()}")
      val edges = graft.ops.Overlap.edges(ct)
      println(s"[probe] overlap edges=${edges.count()}")
      time("overlap_edges_noop") { noop(graft.ops.Overlap.edges(ct)) }
      val nodes = ct.select(col("conv_id").as("node")).distinct()
      time("cc_loop") {
        noop(graft.graph.Graph.connectedComponents(
          graft.ops.Overlap.edges(ct), Some(nodes)))
      }
      time("cc_loop_p2") {
        graft.stream.StatePartitions.scoped(spark, 2) {
          noop(graft.graph.Graph.connectedComponents(
            graft.ops.Overlap.edges(ct), Some(nodes)))
        }
      }
      time("bfs_full") {
        noop(graft.graph.Graph.multiSourceBfs(
          graft.ops.Overlap.edges(ct),
          nodes.where(col("node").startsWith("c0d"))
            .select(lit("a").as("tag"), col("node")),
          directed = false))
      }
      time("bfs_full_p2") {
        graft.stream.StatePartitions.scoped(spark, 2) {
          noop(graft.graph.Graph.multiSourceBfs(
            graft.ops.Overlap.edges(ct),
            nodes.where(col("node").startsWith("c0d"))
              .select(lit("a").as("tag"), col("node")),
            directed = false))
        }
      }
      def scopedConf[A](pairs: (String, String)*)(body: => A): A = {
        val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
        pairs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      time("cc_loop_p1_noaqe") {
        scopedConf("spark.sql.shuffle.partitions" -> "1",
                   "spark.sql.adaptive.enabled" -> "false") {
          noop(graft.graph.Graph.connectedComponents(
            graft.ops.Overlap.edges(ct), Some(nodes)))
        }
      }
      time("bfs_full_p1_noaqe") {
        scopedConf("spark.sql.shuffle.partitions" -> "1",
                   "spark.sql.adaptive.enabled" -> "false") {
          noop(graft.graph.Graph.multiSourceBfs(
            graft.ops.Overlap.edges(ct),
            nodes.where(col("node").startsWith("c0d"))
              .select(lit("a").as("tag"), col("node")),
            directed = false))
        }
      }
      // job count + cumulative scheduler view of one cc run
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      jobs.set(0)
      noop(graft.graph.Graph.connectedComponents(
        graft.ops.Overlap.edges(ct), Some(nodes)))
      spark.sparkContext.removeSparkListener(listener)
      println(s"[probe] cc_jobs=${jobs.get()}")
    }

    if (want("gfa")) {
      val t = graft.gen.Transcripts.turns(spark, sfDir)
      val segLines = t.select(concat_ws("\t", lit("S"),
          graft.ops.TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"),
          concat(lit("LN:i:"), length(col("text")).cast("string")))
        .as("value"))
      time("gfa_render_noop") { noop(segLines) }
      time("gfa_records_noop") { noop(graft.gfa.GfaParse.records(segLines)) }
      time("gfa_segments_noop") { noop(graft.gfa.GfaParse.segments(segLines)) }
      time("gfa_segments_notags") {
        noop(graft.gfa.GfaParse.segments(segLines).select("id", "sequence"))
      }
      time("gfa_bytes_full") { noop(graft.gfa.GfaAnalysis.byteTotals(segLines)) }
      val segLines32 = t.repartition(32).select(concat_ws("\t", lit("S"),
          graft.ops.TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"),
          concat(lit("LN:i:"), length(col("text")).cast("string")))
        .as("value"))
      time("gfa_bytes_full_32") {
        noop(graft.gfa.GfaAnalysis.byteTotals(segLines32))
      }
      println(s"[probe] turns partitions=${t.rdd.getNumPartitions}")
    }

    if (want("dup")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val sh = graft.ops.OracleSig.materialize(spark, sfDir, "mh_sh",
          graft.ops.OracleSig.docsFp(docs))(
        graft.text.Dedup.shingleTable(docs, "doc_id", "text", shingleK = 5))
      val bands = graft.ops.OracleSig.materialize(spark, sfDir, "mh_bands",
          graft.ops.OracleSig.docsFp(docs))(
        graft.text.Dedup.minhashBands(sh, numHashes = 32, bands = 8))
      time("minhash_pairs_noop") {
        noop(graft.text.Dedup.minhashNearDupsFrom(sh, bands, threshold = 0.5))
      }
      time("dup_clusters_full") {
        noop(graft.text.Dedup.clustersFromPairs(
          graft.text.Dedup.minhashNearDupsFrom(sh, bands, threshold = 0.5), docs))
      }
      time("corpus_filter_full") {
        noop(graft.text.CorpusFilter.funnel(docs,
          graft.text.Dedup.minhashNearDupsFrom(sh, bands, threshold = 0.5)))
      }
    }

    if (want("scan")) {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      println(s"[probe] emb scan partitions=${e.rdd.getNumPartitions}")
      val e32 = e.repartition(32)
      def simonly(corpus: org.apache.spark.sql.DataFrame): Unit = {
        val c = corpus.select(col("vec_id").as("nbr_id"), col("embedding").as("nbr_vec"))
          .withColumn("nbr_norm", sqrt(graft.functions.VecFunctions.vec_dot(col("nbr_vec"), col("nbr_vec"))))
        val q = corpus.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
          .withColumn("q_norm", sqrt(graft.functions.VecFunctions.vec_dot(col("q_vec"), col("q_vec"))))
        val sim = (graft.functions.VecFunctions.vec_dot(col("q_vec"), col("nbr_vec")) /
          (col("q_norm") * col("nbr_norm"))).as("sim")
        noop(c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
          .select(col("query_id"), col("nbr_id"), sim)
          .groupBy("query_id").agg(max("sim"), min("nbr_id")))
      }
      time("knn_simonly_1part") { simonly(e) }
      time("knn_simonly_32part") { simonly(e32) }
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      time("q1_agg_1part") {
        noop(li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), count(lit(1)), countDistinct("l_orderkey")))
      }
      time("q1_agg_32part") {
        noop(li.repartition(32).groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), count(lit(1)), countDistinct("l_orderkey")))
      }
      // does a filter above repartition still push to the parquet scan?
      val filtered = li.repartition(32).where(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
      println("[probe] pushdown-through-repartition plan:\n" +
        filtered.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("PushedFilters") || l.contains("Filter"))
          .mkString("\n"))
    }

    if (want("turns")) {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      time("turns_noop_plain") {
        noop(graft.gen.Transcripts.fromEvents(ev))
      }
      time("turns_noop_wide") {
        noop(graft.gen.Transcripts.fromEvents(graft.ops.Scans.wide(ev)))
      }
      // a representative T-consumer: edges (second window on same key)
      time("conv_edges_plain") {
        noop(graft.ops.TurnGraph.edges(graft.gen.Transcripts.fromEvents(ev)))
      }
      time("conv_edges_wide") {
        noop(graft.ops.TurnGraph.edges(
          graft.gen.Transcripts.fromEvents(graft.ops.Scans.wide(ev))))
      }
      time("csr_agg_plain") {
        import spark.implicits._
        val t = graft.gen.Transcripts.fromEvents(ev)
          .withColumn("ts", col("ts").cast("timestamp")).as[graft.schema.Turn]
        noop(t.groupByKey(_.conv_id)
          .agg(graft.ops.ConvCsrAggregator.toColumn.name("csr")).toDF())
      }
      time("csr_agg_wide") {
        import spark.implicits._
        val t = graft.gen.Transcripts.fromEvents(graft.ops.Scans.wide(ev))
          .withColumn("ts", col("ts").cast("timestamp")).as[graft.schema.Turn]
        noop(t.groupByKey(_.conv_id)
          .agg(graft.ops.ConvCsrAggregator.toColumn.name("csr")).toDF())
      }
    }

    if (want("docs")) {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val d32 = d.repartition(32)
      time("doc_quality_1p") { noop(graft.text.TextAnalysis.quality(d)) }
      time("doc_quality_32p") { noop(graft.text.TextAnalysis.quality(d32)) }
      time("doc_repetition_1p") { noop(graft.text.Curation.repetition(d)) }
      time("doc_repetition_32p") { noop(graft.text.Curation.repetition(d32)) }
      time("doc_tokens_1p") {
        noop(d.select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")),
          graft.text.TextAnalysis.bpeishTokenCount(col("text"))))
      }
      time("doc_tokens_32p") {
        noop(d32.select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")),
          graft.text.TextAnalysis.bpeishTokenCount(col("text"))))
      }
      time("gram_hashes_1p") {
        noop(graft.text.TextAnalysis.gramHashes(d, "doc_id", "text", k = 8))
      }
      time("gram_hashes_32p") {
        noop(graft.text.TextAnalysis.gramHashes(d32, "doc_id", "text", k = 8))
      }
    }

    if (want("dimplan")) {
      val dim = graft.gen.Transcripts.turns(spark, sfDir).groupBy("conv_id")
        .agg(min(col("ts").cast("timestamp")).as("first_ts"))
      println("[probe] dim plan:\n" + dim.queryExecution.executedPlan.toString)
    }

    if (want("stream2")) {
      val rows = graft.gen.Transcripts.fromEvents(
          spark.read.parquet(s"$sfDir/events.parquet")
            .where(col("user_id") < 10))
        .where(col("ts").isNotNull)
        .withColumn("ts", col("ts").cast("timestamp"))
        .as[graft.schema.Turn].collect().sortBy(_.ts.getTime)
      for (root <- Seq("/tmp/graft_ckpt_probe", "/dev/shm/graft_ckpt_probe")) {
        time(s"stream_sessions_ckpt:$root") {
          import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
          val ms = MemoryStream[graft.schema.Turn](
            org.apache.spark.sql.Encoders.product[graft.schema.Turn],
            spark.sqlContext)
          val name = s"probe_sess_${System.nanoTime()}"
          val parts = graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
          val q = graft.stream.StatePartitions.scoped(spark, parts) {
            graft.stream.CepQueries.sessionStats(ms.toDF(),
                watermark = "10 minutes", gap = "30 minutes")
              .writeStream.format("memory").queryName(name)
              .option("checkpointLocation", s"$root/$name")
              .outputMode("append").start()
          }
          try {
            val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
            ms.addData(b1); q.processAllAvailable()
            ms.addData(b2); q.processAllAvailable()
            ms.addData(Seq(graft.schema.Turn("__sentinel__", 0, "user", "s", None,
              new java.sql.Timestamp(rows.last.ts.getTime + 48L * 3600 * 1000))))
            q.processAllAvailable()
          } finally q.stop()
          q.recentProgress.lastOption.foreach { p =>
            println(s"[probe]   last durationMs=${p.durationMs}") }
        }
      }
    }

    if (want("stream3")) {
      import java.util.concurrent.ConcurrentLinkedQueue
      val jobs = new ConcurrentLinkedQueue[(Int, Long, Long)]() // id, wall, taskTime
      val taskTime = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(js.jobId, System.nanoTime())
          taskTime.put(js.jobId, new java.util.concurrent.atomic.AtomicLong)
          js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
        }
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val j = stageToJob.get(te.stageId)
          val t = taskTime.get(j)
          if (t != null && te.taskInfo != null) t.addAndGet(te.taskInfo.duration)
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.get(je.jobId)
          val t = taskTime.get(je.jobId)
          if (s != 0L) jobs.add((je.jobId, (System.nanoTime() - s) / 1000000L,
                                 if (t == null) -1 else t.get()))
        }
      }
      val rows = graft.gen.Transcripts.fromEvents(
          spark.read.parquet(s"$sfDir/events.parquet")
            .where(col("user_id") < 10))
        .where(col("ts").isNotNull)
        .withColumn("ts", col("ts").cast("timestamp"))
        .as[graft.schema.Turn].collect().sortBy(_.ts.getTime)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      locally {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[graft.schema.Turn](
          org.apache.spark.sql.Encoders.product[graft.schema.Turn],
          spark.sqlContext)
        val name = s"probe_s3_${System.nanoTime()}"
        val parts = graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
        val q = graft.stream.StatePartitions.scoped(spark, parts) {
          graft.stream.CepQueries.sessionStats(ms.toDF(),
              watermark = "10 minutes", gap = "30 minutes")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        }
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
          ms.addData(Seq(graft.schema.Turn("__sentinel__", 0, "user", "s", None,
            new java.sql.Timestamp(rows.last.ts.getTime + 48L * 3600 * 1000))))
          q.processAllAvailable()
        } finally q.stop()
      }
      val wall = (System.nanoTime() - t0) / 1000000L
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(500)
      var sumWall = 0L; var sumTask = 0L; var n = 0
      jobs.forEach { case (id, w, tt) =>
        println(s"[probe] job=$id wall=${w}ms taskTime=${tt}ms")
        sumWall += w; sumTask += tt; n += 1
      }
      println(s"[probe] stream wall=${wall}ms jobs=$n jobWallSum=${sumWall}ms " +
        s"taskTimeSum=${sumTask}ms gap=${wall - sumWall}ms")
    }

    if (want("stream")) {
      // decompose one representative streaming query: feed vs run
      val rows = graft.gen.Transcripts.fromEvents(
          spark.read.parquet(s"$sfDir/events.parquet")
            .where(col("user_id") < 10))
        .where(col("ts").isNotNull)
        .withColumn("ts", col("ts").cast("timestamp"))
        .as[graft.schema.Turn].collect().sortBy(_.ts.getTime)
      println(s"[probe] stream feed rows=${rows.length}")
      time("stream_sessions_run") {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[graft.schema.Turn](
          org.apache.spark.sql.Encoders.product[graft.schema.Turn],
          spark.sqlContext)
        val name = s"probe_sess_${System.nanoTime()}"
        val parts = graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
        val q = graft.stream.StatePartitions.scoped(spark, parts) {
          graft.stream.CepQueries.sessionStats(ms.toDF(),
              watermark = "10 minutes", gap = "30 minutes")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
        }
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
          ms.addData(Seq(graft.schema.Turn("__sentinel__", 0, "user", "s", None,
            new java.sql.Timestamp(rows.last.ts.getTime + 48L * 3600 * 1000))))
          q.processAllAvailable()
          q.recentProgress.foreach { p =>
            println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
              s"durationMs=${p.durationMs}")
          }
        } finally q.stop()
      }
    }

    spark.stop()
  }
}
