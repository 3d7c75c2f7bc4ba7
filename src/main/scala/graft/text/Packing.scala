package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: concatenate every document's tokens in a
  * deterministic global order (ascending id) and cut fixed
  * `budget`-token training sequences; a document may straddle a cut —
  * the standard pretraining packing that wastes zero pad tokens (the
  * alternative, first-fit bin packing, is order-dependent and
  * non-relational).
  *
  * The only global computation is the running token offset — and a
  * naive `sum() over (order by id)` funnels the ENTIRE corpus through
  * one partition. This implementation is a TWO-PHASE distributed prefix
  * sum instead: per-bucket subtotals (one row per `bucketSize`-id
  * bucket) are prefix-summed on a bucket-count-sized relation and
  * broadcast-joined back, so the corpus-sized relation only ever does a
  * bucket-partitioned window. At 100 TB with 10^9 docs and bucketSize
  * 2^20 the bucket relation is ~1000 rows.
  */
object Packing {

  /** Per-document packing coordinates: token count, global token offset
    * (tokens in all lower-id docs), and the first/last sequence index
    * the doc's tokens land in after cutting every `budget` tokens.
    * Output: (idCol, n_tokens, tok_offset, seq_first, seq_last).
    *
    * Tokens are single-space-split words (the corpus contract shared
    * with [[Curation.chunk]]), so every engine computes identical
    * counts.
    */
  def packOffsets(docs: DataFrame, budget: Int, bucketSize: Long = 1L << 20,
                  idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    require(budget >= 1, s"sequence budget must be >= 1, got $budget")
    require(bucketSize >= 1, s"bucket size must be >= 1, got $bucketSize")
    // `div` (integer division), not floor(a / b): Column `/` is double
    // division, exact only below 2^53 — an extreme corpus's offsets
    // would silently round. Matches the oracle's `//`.
    val perDoc = docs.select(
      col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"),
      expr(s"cast($idCol as bigint) div $bucketSize").as("bucket"))
    // phase 1: prefix sum WITHIN each bucket (bucket-partitioned window
    // — no global sort, no single-partition corpus pass)
    val intra = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // phase 2: prefix sum ACROSS buckets on the one-row-per-bucket
    // relation (the single-partition exchange here moves bucket-count
    // rows, not corpus rows), broadcast back
    val bucketOffsets = perDoc.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum("bucket_total").over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    perDoc
      .withColumn("intra_offset", coalesce(sum("n_tokens").over(intra), lit(0L)))
      .join(broadcast(bucketOffsets), "bucket")
      .select(col(idCol),
        col("n_tokens").cast("int").as("n_tokens"),
        (col("bucket_offset") + col("intra_offset")).as("tok_offset"),
        expr(s"cast((bucket_offset + intra_offset) div $budget as int)")
          .as("seq_first"),
        expr(s"cast((bucket_offset + intra_offset + n_tokens - 1) div $budget as int)")
          .as("seq_last"))
  }
}
