package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Conversation-overlap graph: conversations become adjacent when they
  * share an exact turn text (the transcript analog of the reference's
  * sequence inverted index, analysis.py:96-107, generalized to a
  * conv×conv graph).
  *
  * Scale guard: the text self-join is quadratic PER TEXT — a text shared
  * by m conversations emits m(m−1)/2 pairs, so one boilerplate string
  * (a common error message) shared by 10⁶ conversations would alone
  * produce ~5·10¹¹ join rows. [[convText]] therefore df-caps the text
  * table: texts shared by more than `maxDf` conversations are dropped
  * from edge building (the same bucket-cap guard as the LSH family,
  * [[graft.text.Dedup]]) and reported by the counted [[droppedTexts]]
  * side output — the reference's blowup-warning philosophy
  * (builders.py:379-380). The window count rides the same
  * hash-partition-by-text shuffle the self-join needs anyway.
  */
object Overlap {

  /** Default document-frequency cap: 64 conversations per text bounds any
    * single text's contribution to ≤ 2016 pairs; a text more common than
    * that is boilerplate, not a similarity signal.
    */
  val DefaultMaxDf: Int = 64

  /** Distinct (conv_id, text) pairs whose text is shared by at most
    * `maxDf` conversations — the df-capped base of the overlap join.
    */
  def convText(turns: DataFrame, maxDf: Int = DefaultMaxDf): DataFrame =
    turns.select("conv_id", "text").distinct()
      .withColumn("df", count(lit(1)).over(Window.partitionBy("text")))
      .where(col("df") <= maxDf).drop("df")

  /** Counted side output: texts dropped by the df cap, with their
    * conversation counts.
    */
  def droppedTexts(turns: DataFrame, maxDf: Int = DefaultMaxDf): DataFrame =
    turns.select("conv_id", "text").distinct()
      .groupBy("text").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf)

  /** Overlap edges (src < dst, distinct) over a df-capped conv-text
    * table.
    */
  def edges(ct: DataFrame): DataFrame =
    ct.as("a").join(ct.as("b"),
        col("a.text") === col("b.text") && col("a.conv_id") < col("b.conv_id"))
      .select(col("a.conv_id").as("src"), col("b.conv_id").as("dst"))
      .distinct()

  /** Overlap edges weighted by the number of shared texts. */
  def weightedEdges(ct: DataFrame): DataFrame =
    ct.as("a").join(ct.as("b"),
        col("a.text") === col("b.text") && col("a.conv_id") < col("b.conv_id"))
      .groupBy(col("a.conv_id").as("src"), col("b.conv_id").as("dst"))
      .agg(count(lit(1)).cast("double").as("weight"))
}
