package graft.gfa

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing façade mirroring the reference CLI surface (cli.py):
  * `convert` / `stats` / `distance` / `distance-matrix` / `export`. A
  * gfa2network user maps each invocation 1:1:
  *
  * {{{
  * // gfa2network convert graph.gfa --matrix adj.npz --bidirected
  * val g = Gfa.read(spark, "graph.gfa")
  * val coo = g.cooMatrix(GfaOptions(bidirected = true))
  * GfaExport.saveMatrix(coo, "adj.parquet")
  * // gfa2network distance graph.gfa --seq ACGT TTTT
  * g.sequenceDistance("ACGT", "TTTT")
  * // gfa2network distance-matrix graph.gfa -o out.csv
  * GfaExport.saveMatrix(g.distanceMatrix(), "out", format = "csv")
  * // gfa2network stats graph.gfa
  * g.stats()
  * }}}
  */
object Gfa {
  /** Reads .gfa or .gfa.gz (S2 — Spark's text source decompresses .gz). */
  def read(spark: SparkSession, path: String): Gfa =
    new Gfa(spark, GfaGraph.readLines(spark, path))

  def fromLines(spark: SparkSession, lines: DataFrame): Gfa =
    new Gfa(spark, lines)
}

final class Gfa(spark: SparkSession, lines: DataFrame) {
  private implicit val s: SparkSession = spark

  lines.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  def segments: DataFrame = GfaParse.segments(lines)
  def links: DataFrame = GfaParse.links(lines)
  def paths: DataFrame = GfaParse.paths(lines)

  def nodes(opts: GfaOptions = GfaOptions()): DataFrame =
    GfaGraph.nodes(lines, opts)
  def edges(opts: GfaOptions = GfaOptions()): DataFrame =
    GfaGraph.edges(lines, opts)
  def nodeIndex(opts: GfaOptions = GfaOptions()): DataFrame =
    GfaGraph.nodeIndex(lines, opts)
  def cooMatrix(opts: GfaOptions = GfaOptions()): DataFrame =
    GfaGraph.cooMatrix(lines, opts)

  /** `gfa2network stats` (cli.py:364-376). */
  def stats(opts: GfaOptions = GfaOptions(directed = true)): DataFrame =
    GfaAnalysis.computeStats(lines, opts)

  /** `gfa2network distance --seq A B` (cli.py:310-320). */
  def sequenceDistance(seqA: String, seqB: String,
                       opts: GfaOptions = GfaOptions()): DataFrame =
    GfaAnalysis.sequenceDistance(lines, seqA, seqB, opts)

  /** `gfa2network distance --path A B` (cli.py:322-346). */
  def pathDistance(pathA: String, pathB: String, method: String = "min",
                   opts: GfaOptions = GfaOptions()): DataFrame =
    GfaAnalysis.genomeDistance(lines, pathA, pathB, method, opts)

  /** `gfa2network distance-matrix` (cli.py:347-363). */
  def distanceMatrix(method: String = "min",
                     opts: GfaOptions = GfaOptions()): DataFrame =
    GfaAnalysis.genomeDistanceMatrix(lines, method, opts)

  /** `gfa2network convert --split-on-alignment` (builders.py:302-430). */
  def splitOnAlignment(): SplitAlignment.Result = SplitAlignment(lines)

  /** `gfa2network export --format edge-list|json` (cli.py:264-306). */
  def exportEdgeList(path: String, opts: GfaOptions = GfaOptions()): Unit =
    GfaExport.saveEdgeList(lines, path, opts)
  def exportJson(dir: String, opts: GfaOptions = GfaOptions()): Unit =
    GfaExport.saveJsonNodeLink(lines, dir, opts)

  def unpersist(): Unit = lines.unpersist()
}
