package graft.gfa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Split-on-alignment (G5/G6 + J2/J3; reference builders.py:302-430):
  * every segment is partitioned at its alignment breakpoints into
  * sub-segment nodes `seg:a-b`; E/C edges are rewired to the exact
  * sub-node their coordinates name, orientation-only edges and links to
  * the segment's full-span node; consecutive sub-segments are chained
  * with +/+ links. Unmappable edges are skipped into a rejects side
  * output (the reference warns and drops).
  *
  * Fully distributed: one shuffle to collect breakpoints per segment, one
  * explode to generate intervals, equi-joins for rewiring — no driver
  * dictionaries (the reference's `mapping` dict becomes a join relation).
  *
  * Transcript analog: session segmentation — a conversation split at
  * inactivity boundaries into session sub-nodes ([[graft.ops.Sessions]]).
  */
object SplitAlignment {

  /** Result memo, keyed on the canonicalized input plan and LRU-bounded
    * ([[graft.ops.SessionMemoOf]]): one construction per (session,
    * input) — a production caller constructs once and reads all four
    * outputs, and the three q_split_* driver queries share through this.
    *
    * Construction MATERIALIZES the parsed record tables and the hub
    * relations eagerly as checkpointed leaves (localCheckpoint +
    * fresh-stats leaf, [[graft.graph.Graph]]'s iterative-kernel
    * pattern): `intervals` is referenced by six downstream relations and
    * the fat GfaParse expression trees by several each, and a persist()
    * barrier alone leaves those trees INSIDE every downstream plan — each
    * query action then re-analyzes hundreds of parse expressions
    * (measured as the dominant cost of q_split_edges, ~5 s warm at
    * sf0.1 in round 4). With leaf intermediates, a downstream query's
    * whole tree is a handful of joins over LogicalRDD leaves: analysis
    * cost tracks the OPERATOR count, not the parse layer.
    *
    * Lifetime: a leaf's cached blocks are freed by Spark's
    * ContextCleaner once the Result is unreferenced (memo eviction drops
    * only the memo's reference) — so a caller-held Result can NEVER be
    * silently degraded to recompute by someone else's eviction, which
    * the previous per-hub unpersist-on-evict LRU could do.
    */
  private val resultCache = new graft.ops.SessionMemoOf[Any, Result](16)

  final case class Result(
      nodes: DataFrame,       // (node, seg, start, end, length)
      edges: DataFrame,       // (src, dst, from_orient, to_orient, kind)
      rejectedEdges: DataFrame,
      rejectedLinks: DataFrame)

  def apply(lines: DataFrame): Result = {
    val planKey: Any = lines.queryExecution.analyzed.canonicalized
    resultCache.getOrElseUpdate(lines.sparkSession, planKey)(build(lines))
  }

  /** Eager materialization to a slim leaf: execute once, and every
    * downstream plan holds a LogicalRDD instead of the subtree
    * (default-stats leaf via the graftbridge — same pattern as the
    * iterative graph kernels).
    */
  private def leaf(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.Bridge.freshLeaf(df.localCheckpoint(true))

  private def build(lines: DataFrame): Result = {
    val segs = leaf(GfaParse.segments(lines).select("id", "length"))
    val ecs = leaf(GfaParse.gfa2Edges(lines).unionByName(
      GfaParse.containments(lines).drop("pos"), allowMissingColumns = true)
      .select("from_id", "from_orient", "to_id", "to_orient",
              "from_start", "from_end", "to_start", "to_end"))
    val links = leaf(GfaParse.links(lines)
      .select("from_id", "from_orient", "to_id", "to_orient"))

    // 1. breakpoint set per segment (A10): {0, length} ∪ edge coords
    val segBps = segs.select(col("id").as("seg"),
        when(col("length").isNotNull, array(lit(0), col("length")))
          .otherwise(array(lit(0))).as("bps"))
      .select(col("seg"), explode(col("bps")).as("bp"))
    val edgeBps = ecs.select(col("from_id").as("seg"),
        explode(array(col("from_start"), col("from_end"))).as("bp"))
      .union(ecs.select(col("to_id").as("seg"),
        explode(array(col("to_start"), col("to_end"))).as("bp")))
      .where(col("bp").isNotNull)
    val bps = segBps.union(edgeBps)
      .groupBy("seg").agg(array_sort(collect_set("bp")).as("bps"))

    // 2. intervals per segment: adjacent breakpoint pairs; single-point
    // sets extend to {p, length} or degenerate {p, p} (builders.py:353-358).
    // INNER join on declared segments: coordinates naming a segment with no
    // S record must NOT mint intervals — such edges are rejects, exactly
    // like the reference's mapping KeyError (builders.py:385-394).
    val withLen = bps.join(segs.withColumnRenamed("id", "seg"), Seq("seg"))
    val intervalsRaw = withLen
      .withColumn("bps2",
        when(size(col("bps")) > 1, col("bps"))
          .when(col("length").isNotNull,
                array(element_at(col("bps"), 1), col("length")))
          .otherwise(array(element_at(col("bps"), 1), element_at(col("bps"), 1))))
      .select(col("seg"), col("length"),
        posexplode(zip_with(
          slice(col("bps2"), 1, 1000000),
          slice(col("bps2"), 2, 1000000),
          (a, b) => struct(a.as("a"), b.as("b"))))
          .as(Seq("pos", "iv")))
      .where(col("iv.b").isNotNull)
      .select(col("seg"), col("length"), col("pos"),
        col("iv.a").as("a"), col("iv.b").as("b"),
        concat(col("seg"), lit(":"), col("iv.a"), lit("-"), col("iv.b"))
          .as("node"))

    val intervals = leaf(intervalsRaw)

    // 3. full-span node per segment: interval (0, length) if present, else
    // the first interval (builders.py:365-373)
    val full = leaf(intervals
      .withColumn("isFull",
        col("length").isNotNull && col("a") === 0 && col("b") === col("length"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("seg").orderBy(col("isFull").desc, col("pos"))))
      .where(col("rank") === 1)
      .select(col("seg"), col("node").as("full_node")))

    // 4. coordinate mapping relation: interval entries + (0,length)→full
    // override + the null-coordinate sentinel → full (dict order:
    // the (seg,0,len) full override wins over the plain interval entry)
    val ivMap = intervals.select(col("seg"), col("a"), col("b"), col("node"))
      .join(full, Seq("seg"))
      .join(segs.select(col("id").as("seg"), col("length")), Seq("seg"), "left")
      .select(col("seg"), col("a"), col("b"),
        when(col("length").isNotNull && col("a") === 0 &&
               col("b") === col("length"), col("full_node"))
          .otherwise(col("node")).as("node"))
    val fullAsSpan = full
      .join(segs.select(col("id").as("seg"), col("length")), Seq("seg"))
      .where(col("length").isNotNull)
      .select(col("seg"), lit(0).as("a"), col("length").as("b"),
              col("full_node").as("node"))
    val sentinel = full.select(col("seg"), lit(-1).as("a"), lit(-1).as("b"),
                               col("full_node").as("node"))
    // the coordinate dict analog is the third hub: both rewiring joins
    // (and their left-join reject twins) read it
    val mapping = leaf(ivMap.unionByName(fullAsSpan).unionByName(sentinel)
      .dropDuplicates("seg", "a", "b"))

    // 5. chain links between consecutive intervals (G6)
    val chain = intervals
      .withColumn("nxt", lead("node", 1).over(
        Window.partitionBy("seg").orderBy("pos")))
      .where(col("nxt").isNotNull && col("a") =!= col("b"))
      .select(col("node").as("src"), col("nxt").as("dst"),
              lit("+").as("from_orient"), lit("+").as("to_orient"),
              lit("chain").as("kind"))

    // 6. E/C rewiring (J2): null coords → sentinel; anti-join = rejects
    val keyed = ecs
      .withColumn("fa", coalesce(col("from_start"), lit(-1)))
      .withColumn("fb", coalesce(col("from_end"), lit(-1)))
      .withColumn("ta", coalesce(col("to_start"), lit(-1)))
      .withColumn("tb", coalesce(col("to_end"), lit(-1)))
    val mFrom = mapping.select(col("seg").as("from_id"), col("a").as("fa"),
                               col("b").as("fb"), col("node").as("src"))
    val mTo = mapping.select(col("seg").as("to_id"), col("a").as("ta"),
                             col("b").as("tb"), col("node").as("dst"))
    val rewired = keyed
      .join(mFrom, Seq("from_id", "fa", "fb"))
      .join(mTo, Seq("to_id", "ta", "tb"))
      .select(col("src"), col("dst"), col("from_orient"), col("to_orient"),
              lit("edge").as("kind"))
    val rejectedE = keyed
      .join(mFrom, Seq("from_id", "fa", "fb"), "left")
      .join(mTo, Seq("to_id", "ta", "tb"), "left")
      .where(col("src").isNull || col("dst").isNull)
      .drop("fa", "fb", "ta", "tb", "src", "dst")

    // 7. L rewiring (J3): both endpoints to full-span nodes
    val lFrom = full.select(col("seg").as("from_id"), col("full_node").as("src"))
    val lTo = full.select(col("seg").as("to_id"), col("full_node").as("dst"))
    val rewiredL = links
      .join(lFrom, Seq("from_id")).join(lTo, Seq("to_id"))
      .select(col("src"), col("dst"), col("from_orient"), col("to_orient"),
              lit("link").as("kind"))
    val rejectedL = links
      .join(lFrom, Seq("from_id"), "left").join(lTo, Seq("to_id"), "left")
      .where(col("src").isNull || col("dst").isNull)
      .drop("src", "dst")

    val nodes = intervals.select(col("node"), col("seg"), col("a").as("start"),
                                 col("b").as("end"), (col("b") - col("a")).as("length"))
    Result(nodes, rewired.unionByName(chain).unionByName(rewiredL),
           rejectedE, rejectedL)
  }

  /** Blowup guard (R-guard; builders.py:379-380): ratio of sub-nodes to
    * original segments; callers warn above 10×.
    */
  def blowupRatio(lines: DataFrame, result: Result): Double = {
    val nSegs = GfaParse.segments(lines).count()
    if (nSegs == 0) 0.0 else result.nodes.count().toDouble / nSegs
  }
}
