package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gfa.{GfaAnalysis, GfaGraph}

/** Single-node throughput head-to-head against the reference on the SAME
  * synthetic GFA file (default /tmp/bench_big.gfa — 1M segments, 1.5M
  * links, 12 × 1000-segment paths; generator + reference timings recorded
  * in BENCH.md). Runs the same two entry points the reference CLI exposes:
  * compute_stats and genome_distance_matrix(min), default (directed)
  * options = the reference's DiGraph defaults.
  */
object HeadToHead {
  /** Deterministic generator for the head-to-head input (no RNG): N
    * segments, a chain plus multiplicative-hash shortcut links
    * (small-world diameter), P paths of `plen` spread-out segments.
    * Reference side runs the same file via
    * `sys.path.insert(0,'/root/reference'); from gfa2network.analysis
    * import compute_stats, genome_distance_matrix`.
    */
  def writeBigGfa(path: String, n: Int = 1000000, p: Int = 12,
                  plen: Int = 1000): Unit = {
    val w = new java.io.BufferedWriter(new java.io.FileWriter(path), 1 << 20)
    try {
      var i = 0
      while (i < n) { w.write(s"S\ts$i\tACGT\n"); i += 1 }
      i = 0
      while (i < n - 1) { w.write(s"L\ts$i\t+\ts${i + 1}\t+\t0M\n"); i += 1 }
      i = 0
      while (i < n) {
        val j = ((i.toLong * 2654435761L) % n).toInt
        if (j != i) w.write(s"L\ts$i\t+\ts$j\t+\t0M\n")
        i += 2
      }
      var pp = 0
      while (pp < p) {
        val segs = (0 until plen)
          .map(k => s"s${(pp * 101 + 997L * k) % n}+").mkString(",")
        w.write(s"P\tpath$pp\t$segs\t*\n")
        pp += 1
      }
    } finally w.close()
  }

  def main(args: Array[String]): Unit = println(run())

  /** Run the graft side and return the one-line JSON result (spark
    * session created and stopped inside — callable from [[Evidence]]).
    * `n` > 0 generates (if absent) and uses an n-segment input at
    * `<GRAFT_GFA>` instead of the default 1M-segment file.
    */
  def run(n: Int = -1): String = {
    val path = sys.env.getOrElse("GRAFT_GFA",
      if (n > 0) s"/tmp/bench_big_$n.gfa" else "/tmp/bench_big.gfa")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
      if (n > 0) writeBigGfa(path, n) else writeBigGfa(path)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    // warmup: small slice of the same plan shapes
    val drb1 = "/root/reference/tests/data/DRB1-3123_unsorted.gfa"
    GfaAnalysis.computeStats(GfaGraph.readLines(spark, drb1)).collect()

    val lines = GfaGraph.readLines(spark, path)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lines.count()
    if (sys.env.contains("GRAFT_PHASES")) {
      // stats decomposition (dev): where do the seconds go?
      import graft.gfa.GfaOptions
      val opts = GfaOptions(directed = true)
      def t[A](l: String)(f: => A): A = {
        val s0 = System.nanoTime(); val r = f
        println(f"[h2h] $l: ${(System.nanoTime() - s0) / 1e9}%.1f s"); r
      }
      val nodes = GfaGraph.nodes(lines, opts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = GfaGraph.edges(lines, opts)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("nodes.count")(nodes.count())
      t("edgeCount")(graft.graph.Graph.edgeCount(edges, directed = true))
      t("components")(graft.graph.Graph.connectedComponents(
        edges, Some(nodes)).agg(org.apache.spark.sql.functions.countDistinct("label")).collect())
      t("maxDegree")(graft.graph.Graph.degrees(edges, directed = true)
        .agg(org.apache.spark.sql.functions.max("degree")).collect())
      t("pathCount")(GfaGraph.pathCount(lines))
      nodes.unpersist(false); edges.unpersist(false)
    }
    val t0 = System.nanoTime()
    val st = GfaAnalysis.computeStats(lines).collect()(0)
    val tStats = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val m = GfaAnalysis.genomeDistanceMatrix(lines, "min").collect()
    val tDm = (System.nanoTime() - t1) / 1e9
    val line = f"""{"metric":"head_to_head","file":"$path","cpus":$cpus,""" +
      f""""stats_sec":$tStats%.1f,"dm_sec":$tDm%.1f,""" +
      f""""nodes":${st.getLong(0)},"edges":${st.getLong(1)},""" +
      f""""paths":${st.getLong(2)},"components":${st.getLong(3)},""" +
      f""""max_degree":${st.getLong(4)},"dm_rows":${m.length}}"""
    spark.stop()
    line
  }
}
