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

  /** Collected node with its reference attrs (builders.py:171-189). */
  private case class XNode(id: String, length: Option[Int],
                           sequence: Option[String], tags: Option[String])
  /** Collected edge with its reference attrs (builders.py:236-245). */
  private case class XEdge(src: String, dst: String, weight: Option[Double],
                           oriFrom: Option[String], oriTo: Option[String],
                           tags: Option[String])

  /** Tag map rendered back to canonical GFA text (`TAG:TYPE:VALUE`,
    * `;`-joined, key-sorted) — XML attribute values must be scalar, and
    * this form round-trips losslessly through [[GfaParse.tagMap]].
    */
  private def tagStrAt(r: org.apache.spark.sql.Row, idx: Int): Option[String] =
    if (r.isNullAt(idx)) None
    else {
      val m = r.getMap[String, String](idx)
      if (m.isEmpty) None
      else Some(m.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" }
        .mkString(";"))
    }

  /** Collect the graph to the driver for single-file XML serialization,
    * guarded: GraphML/GEXF are driver-side formats for SMALL result
    * graphs (the reference pipes the whole networkx object to a writer,
    * cli.py:282-306); a distributed graph belongs in parquet/JSON.
    * Node attrs (length/sequence/tags) come from the S records —
    * bidirected `id:ori` nodes strip the suffix to find their segment and
    * both orientations carry the same payload (builders.py:167-178);
    * edge attrs ride [[GfaGraph.edgesWithAttrs]].
    */
  private def collectGraph(lines: DataFrame, opts: GfaOptions, maxNodes: Long)
      : (Seq[XNode], Seq[XEdge]) = {
    // guard BEFORE collecting — the whole point is protecting the driver
    // heap, so counts run distributed first; edges bounded too (a capped
    // node set can still carry an unbounded multigraph edge set)
    val nodeDf = GfaGraph.nodes(lines, opts)
    val nNodes = nodeDf.count()
    if (nNodes > maxNodes)
      throw new IllegalStateException(
        s"XML export of $nNodes nodes exceeds maxNodes=$maxNodes; " +
        "use parquet/JSON exports for large graphs")
    val edgeDf = GfaGraph.edgesWithAttrs(lines, opts)
    val nEdges = edgeDf.count()
    if (nEdges > 10L * maxNodes)
      throw new IllegalStateException(
        s"XML export of $nEdges edges exceeds ${10L * maxNodes}; " +
        "use parquet/JSON exports for large graphs")
    // duplicate S records for one id are pathological; pick the attribute
    // row DETERMINISTICALLY — min by (length, sequence, canonical tag
    // text) — rather than dropDuplicates' arbitrary partition-order row,
    // so repeated exports of the same (malformed) input are byte-identical
    val tagText = array_join(
      transform(array_sort(map_keys(col("tags"))),
                k => concat(k, lit(":"), element_at(col("tags"), k))),
      ";")
    val segAttrs = GfaParse.segments(lines)
      .select(col("id").as("seg_id"), col("length"), col("sequence"),
              col("tags"))
      .groupBy("seg_id")
      .agg(min_by(struct(col("length"), col("sequence"), col("tags")),
                  struct(col("length"), col("sequence"), tagText)).as("a"))
      .select(col("seg_id"), col("a.length").as("length"),
              col("a.sequence").as("sequence"), col("a.tags").as("tags"))
    val segKey =
      if (opts.bidirected) regexp_replace(col("node"), ":[+-]$", "")
      else col("node")
    val nodes = nodeDf.withColumn("seg_id", segKey)
      .join(segAttrs, Seq("seg_id"), "left")
      .select("node", "length", "sequence", "tags")
      .orderBy("node").collect().map { r =>
        XNode(r.getString(0),
              if (r.isNullAt(1)) None else Some(r.getInt(1)),
              Option(r.getString(2)),
              tagStrAt(r, 3))
      }.toSeq
    val edges = edgeDf
      .select("src", "dst", "weight", "orientation_from", "orientation_to",
              "tags")
      .orderBy("src", "dst").collect().map { r =>
        XEdge(r.getString(0), r.getString(1),
              if (r.isNullAt(2)) None else Some(r.getDouble(2)),
              Option(r.getString(3)), Option(r.getString(4)),
              tagStrAt(r, 5))
      }.toSeq
    (nodes, edges)
  }

  /** GraphML export (S12 tail; reference: nx.write_graphml via
    * cli.py:282-306). Single-file XML, networkx-compatible schema: edge
    * keys weight/orientation_from/orientation_to/tags, node keys
    * length/sequence/tags, edgedefault from the graph direction. Absent
    * attrs are omitted per element, exactly like networkx omits keys not
    * in a node's attr dict.
    */
  def saveGraphML(lines: DataFrame, path: String,
                  opts: GfaOptions = GfaOptions(),
                  maxNodes: Long = 1000000): Unit = {
    val (nodes, edges) = collectGraph(lines, opts, maxNodes)
    val sb = new StringBuilder
    sb ++= "<?xml version='1.0' encoding='utf-8'?>\n"
    sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">\n"
    sb ++= "  <key id=\"d0\" for=\"edge\" attr.name=\"weight\" attr.type=\"double\"/>\n"
    sb ++= "  <key id=\"d1\" for=\"edge\" attr.name=\"orientation_from\" attr.type=\"string\"/>\n"
    sb ++= "  <key id=\"d2\" for=\"edge\" attr.name=\"orientation_to\" attr.type=\"string\"/>\n"
    sb ++= "  <key id=\"d3\" for=\"edge\" attr.name=\"tags\" attr.type=\"string\"/>\n"
    sb ++= "  <key id=\"d4\" for=\"node\" attr.name=\"length\" attr.type=\"int\"/>\n"
    sb ++= "  <key id=\"d5\" for=\"node\" attr.name=\"sequence\" attr.type=\"string\"/>\n"
    sb ++= "  <key id=\"d6\" for=\"node\" attr.name=\"tags\" attr.type=\"string\"/>\n"
    sb ++= s"""  <graph edgedefault="${if (opts.graphDirected) "directed" else "undirected"}">\n"""
    nodes.foreach { n =>
      val data = n.length.map(v => s"""<data key="d4">$v</data>""").getOrElse("") +
        n.sequence.map(v => s"""<data key="d5">${xmlEscape(v)}</data>""").getOrElse("") +
        n.tags.map(v => s"""<data key="d6">${xmlEscape(v)}</data>""").getOrElse("")
      if (data.isEmpty) sb ++= s"""    <node id="${xmlEscape(n.id)}"/>\n"""
      else sb ++= s"""    <node id="${xmlEscape(n.id)}">$data</node>\n"""
    }
    edges.foreach { e =>
      sb ++= s"""    <edge source="${xmlEscape(e.src)}" target="${xmlEscape(e.dst)}">"""
      e.weight.foreach(v => sb ++= s"""<data key="d0">$v</data>""")
      e.oriFrom.foreach(v => sb ++= s"""<data key="d1">${xmlEscape(v)}</data>""")
      e.oriTo.foreach(v => sb ++= s"""<data key="d2">${xmlEscape(v)}</data>""")
      e.tags.foreach(v => sb ++= s"""<data key="d3">${xmlEscape(v)}</data>""")
      sb ++= "</edge>\n"
    }
    sb ++= "  </graph>\n</graphml>\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** GEXF 1.2 export (S12 tail; reference: nx.write_gexf). Node/edge
    * attrs are declared `<attributes>` sections with per-element
    * `<attvalue>`s; weight stays the native GEXF edge attribute.
    */
  def saveGexf(lines: DataFrame, path: String,
               opts: GfaOptions = GfaOptions(),
               maxNodes: Long = 1000000): Unit = {
    val (nodes, edges) = collectGraph(lines, opts, maxNodes)
    val sb = new StringBuilder
    sb ++= "<?xml version='1.0' encoding='utf-8'?>\n"
    sb ++= "<gexf xmlns=\"http://gexf.net/1.2\" version=\"1.2\">\n"
    sb ++= s"""  <graph defaultedgetype="${if (opts.graphDirected) "directed" else "undirected"}" mode="static">\n"""
    sb ++= "    <attributes class=\"node\">\n"
    sb ++= "      <attribute id=\"n0\" title=\"length\" type=\"integer\"/>\n"
    sb ++= "      <attribute id=\"n1\" title=\"sequence\" type=\"string\"/>\n"
    sb ++= "      <attribute id=\"n2\" title=\"tags\" type=\"string\"/>\n"
    sb ++= "    </attributes>\n"
    sb ++= "    <attributes class=\"edge\">\n"
    sb ++= "      <attribute id=\"e0\" title=\"orientation_from\" type=\"string\"/>\n"
    sb ++= "      <attribute id=\"e1\" title=\"orientation_to\" type=\"string\"/>\n"
    sb ++= "      <attribute id=\"e2\" title=\"tags\" type=\"string\"/>\n"
    sb ++= "    </attributes>\n"
    sb ++= "    <nodes>\n"
    nodes.foreach { n =>
      val avs = n.length.map(v => s"""<attvalue for="n0" value="$v"/>""").getOrElse("") +
        n.sequence.map(v => s"""<attvalue for="n1" value="${xmlEscape(v)}"/>""").getOrElse("") +
        n.tags.map(v => s"""<attvalue for="n2" value="${xmlEscape(v)}"/>""").getOrElse("")
      if (avs.isEmpty)
        sb ++= s"""      <node id="${xmlEscape(n.id)}" label="${xmlEscape(n.id)}"/>\n"""
      else
        sb ++= s"""      <node id="${xmlEscape(n.id)}" label="${xmlEscape(n.id)}"><attvalues>$avs</attvalues></node>\n"""
    }
    sb ++= "    </nodes>\n    <edges>\n"
    edges.zipWithIndex.foreach { case (e, i) =>
      val wAttr = e.weight.map(v => s""" weight="$v"""").getOrElse("")
      val avs = e.oriFrom.map(v => s"""<attvalue for="e0" value="${xmlEscape(v)}"/>""").getOrElse("") +
        e.oriTo.map(v => s"""<attvalue for="e1" value="${xmlEscape(v)}"/>""").getOrElse("") +
        e.tags.map(v => s"""<attvalue for="e2" value="${xmlEscape(v)}"/>""").getOrElse("")
      if (avs.isEmpty)
        sb ++= s"""      <edge id="$i" source="${xmlEscape(e.src)}" target="${xmlEscape(e.dst)}"$wAttr/>\n"""
      else
        sb ++= s"""      <edge id="$i" source="${xmlEscape(e.src)}" target="${xmlEscape(e.dst)}"$wAttr><attvalues>$avs</attvalues></edge>\n"""
    }
    sb ++= "    </edges>\n  </graph>\n</gexf>\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
