package graft.gfa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export sinks (S8/S9/S11/S12): matrix triplets, dense matrix with the
  * resource guard, node-map sidecar, edge list, JSON node-link.
  */
object GfaExport {

  /** Dense-export resource guard (R1; utils.py:70-77, cli.py:39-44,
    * tests/test_limits.py): abort when the densified matrix would exceed
    * `maxGb` for the given element width.
    */
  def denseGuard(n: Long, itemBytes: Int, maxGb: Double): Unit = {
    val bytes = n * n * itemBytes.toLong
    if (bytes > maxGb * 1e9)
      throw new IllegalStateException(
        f"dense export would need ${bytes / 1e9}%.1f GB (> $maxGb%.1f GB limit); " +
        "write the sparse triplet form instead or raise the limit")
  }

  /** Matrix dtype parameterization (cli.py:92-97; builders.py:280-281):
    * scipy's coo_matrix(dtype=...) choices mapped to Spark casts. `bool`
    * follows numpy truthiness (nonzero → true); integer dtypes truncate
    * toward zero like numpy's astype. Documented divergence: values
    * outside the integer dtype's range raise under ANSI mode rather than
    * wrapping silently like numpy — the safer behavior for a data engine.
    */
  def castWeight(coo: DataFrame, dtype: String): DataFrame = {
    val w = col("weight")
    val cast = dtype match {
      case "bool"    => (w =!= 0.0).as("weight")
      case "int8"    => w.cast("tinyint").as("weight")
      case "int32"   => w.cast("int").as("weight")
      case "float32" => w.cast("float").as("weight")
      case "float64" => w.cast("double").as("weight")
      case other => throw new IllegalArgumentException(s"dtype: $other")
    }
    coo.select(col("row"), col("col"), cast)
  }

  /** Sparse matrix as (row, col, weight) csv/parquet — the .npz analog. */
  def saveMatrix(coo: DataFrame, path: String, format: String = "parquet",
                 dtype: String = "float64"): Unit = {
    val typed = castWeight(coo, dtype)
    format match {
      case "parquet" => typed.orderBy("row", "col").write.mode("overwrite").parquet(path)
      case "csv" => typed.orderBy("row", "col")
        .write.mode("overwrite").option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(s"format: $other")
    }
  }

  /** Dense matrix (guarded): pivot to n columns — only sane for small n,
    * exactly like the reference's .npy/.csv densification.
    */
  def saveDense(coo: DataFrame, n: Long, path: String,
                maxGb: Double = 5.0): Unit = {
    denseGuard(n, 8, maxGb)
    val cols = (0L until n).map(j =>
      coalesce(max(when(col("col") === j, col("weight"))), lit(0.0))
        .as(s"c$j"))
    coo.groupBy("row").agg(cols.head, cols.tail: _*)
      .orderBy("row")
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Node-map sidecar (S9; utils.py:108-114): index↔node TSV aligned to
    * matrix rows.
    */
  def saveNodeMap(nodeIndex: DataFrame, path: String): Unit =
    nodeIndex.select(col("idx"), col("node"))
      .orderBy("idx")
      .write.mode("overwrite").option("sep", "\t").csv(path)

  /** Streaming-friendly edge list `u\tv` (S11; cli.py:264-281) — the
    * minimal parse→project→write slice, no graph state.
    */
  def saveEdgeList(lines: DataFrame, path: String,
                   opts: GfaOptions = GfaOptions()): Unit =
    GfaGraph.edges(lines, opts).select(col("src"), col("dst"))
      .write.mode("overwrite").option("sep", "\t").csv(path)

  /** JSON node-link export (S12; cli.py:282-306): one JSON object per
    * node/link row, nested attrs.
    */
  def saveJsonNodeLink(lines: DataFrame, dir: String,
                       opts: GfaOptions = GfaOptions()): Unit = {
    GfaParse.segments(lines)
      .select(col("id"), col("length"), col("sequence"), col("tags"))
      .write.mode("overwrite").json(s"$dir/nodes")
    GfaGraph.edges(lines, opts)
      .write.mode("overwrite").json(s"$dir/links")
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  /** Collect the graph to the driver for single-file XML serialization,
    * guarded: GraphML/GEXF are driver-side formats for SMALL result
    * graphs (the reference pipes the whole networkx object to a writer,
    * cli.py:282-306); a distributed graph belongs in parquet/JSON.
    */
  private def collectGraph(lines: DataFrame, opts: GfaOptions, maxNodes: Long)
      : (Seq[String], Seq[(String, String, Option[Double])]) = {
    // guard BEFORE collecting — the whole point is protecting the driver
    // heap, so counts run distributed first; edges bounded too (a capped
    // node set can still carry an unbounded multigraph edge set)
    val nodeDf = GfaGraph.nodes(lines, opts)
    val nNodes = nodeDf.count()
    if (nNodes > maxNodes)
      throw new IllegalStateException(
        s"XML export of $nNodes nodes exceeds maxNodes=$maxNodes; " +
        "use parquet/JSON exports for large graphs")
    val edgeDf = GfaGraph.edges(lines, opts)
    val nEdges = edgeDf.count()
    if (nEdges > 10L * maxNodes)
      throw new IllegalStateException(
        s"XML export of $nEdges edges exceeds ${10L * maxNodes}; " +
        "use parquet/JSON exports for large graphs")
    val nodes = nodeDf.orderBy("node").collect().map(_.getString(0)).toSeq
    val edges = edgeDf.orderBy("src", "dst")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
                 if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    (nodes, edges)
  }

  /** GraphML export (S12 tail; reference: nx.write_graphml via
    * cli.py:282-306). Single-file XML, networkx-compatible schema: a
    * `weight` edge key, edgedefault from the graph direction.
    */
  def saveGraphML(lines: DataFrame, path: String,
                  opts: GfaOptions = GfaOptions(),
                  maxNodes: Long = 1000000): Unit = {
    val (nodes, edges) = collectGraph(lines, opts, maxNodes)
    val sb = new StringBuilder
    sb ++= "<?xml version='1.0' encoding='utf-8'?>\n"
    sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n"
    sb ++= "  <key id=\"d0\" for=\"edge\" attr.name=\"weight\" attr.type=\"double\"/>\n"
    sb ++= s"""  <graph edgedefault="${if (opts.graphDirected) "directed" else "undirected"}">\n"""
    nodes.foreach(n => sb ++= s"""    <node id="${xmlEscape(n)}"/>\n""")
    edges.foreach { case (s, d, w) =>
      sb ++= s"""    <edge source="${xmlEscape(s)}" target="${xmlEscape(d)}">"""
      w.foreach(v => sb ++= s"""<data key="d0">$v</data>""")
      sb ++= "</edge>\n"
    }
    sb ++= "  </graph>\n</graphml>\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** GEXF 1.2 export (S12 tail; reference: nx.write_gexf). */
  def saveGexf(lines: DataFrame, path: String,
               opts: GfaOptions = GfaOptions(),
               maxNodes: Long = 1000000): Unit = {
    val (nodes, edges) = collectGraph(lines, opts, maxNodes)
    val sb = new StringBuilder
    sb ++= "<?xml version='1.0' encoding='utf-8'?>\n"
    sb ++= "<gexf xmlns=\"http://gexf.net/1.2\" version=\"1.2\">\n"
    sb ++= s"""  <graph defaultedgetype="${if (opts.graphDirected) "directed" else "undirected"}" mode="static">\n"""
    sb ++= "    <nodes>\n"
    nodes.foreach(n =>
      sb ++= s"""      <node id="${xmlEscape(n)}" label="${xmlEscape(n)}"/>\n""")
    sb ++= "    </nodes>\n    <edges>\n"
    edges.zipWithIndex.foreach { case ((s, d, w), i) =>
      val wAttr = w.map(v => s""" weight="$v"""").getOrElse("")
      sb ++= s"""      <edge id="$i" source="${xmlEscape(s)}" target="${xmlEscape(d)}"$wAttr/>\n"""
    }
    sb ++= "    </edges>\n  </graph>\n</gexf>\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
