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

  /** Sparse matrix as (row, col, weight) csv/parquet — the .npz analog. */
  def saveMatrix(coo: DataFrame, path: String, format: String = "parquet"): Unit =
    format match {
      case "parquet" => coo.orderBy("row", "col").write.mode("overwrite").parquet(path)
      case "csv" => coo.orderBy("row", "col")
        .write.mode("overwrite").option("header", "true").csv(path)
      case other => throw new IllegalArgumentException(s"format: $other")
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
}
