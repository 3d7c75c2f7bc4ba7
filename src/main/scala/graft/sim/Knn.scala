package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VecFunctions.vec_dot

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the correctness baseline, and an
  * LSH-bucketed (random-hyperplane) variant as the scale path.
  *
  * The inner product is a custom codegen'd Catalyst expression
  * ([[graft.functions.FloatVecDot]]); norms are computed once per side
  * before the join, so the O(|q|·|corpus|) hot loop does exactly one
  * array traversal per pair.
  */
object Knn {

  /** Σ a[i]*b[i] in double precision (codegen'd, no per-element lambda). */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def norm(a: Column): Column = sqrt(vec_dot(a, a))

  def cosine(a: Column, b: Column): Column = vec_dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query row against every corpus row.
    * The query side should be small (it is broadcast); ties broken by
    * ascending neighbor id for determinism. O(|q|·|corpus|) — the exact
    * baseline the ANN path is validated against.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .withColumn("nbr_norm", norm(col("nbr_vec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
              (vec_dot(col("q_vec"), col("nbr_vec")) /
                (col("q_norm") * col("nbr_norm"))).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane sign for (plane j, dim i):
    * ±1 from xxhash64 — the hyperplane matrix is never materialized.
    */
  private def planeSign(j: Int, i: Column): Column =
    when(xxhash64(lit(j), i).bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** `bits`-bit random-hyperplane signature (SimHash for vectors). */
  def lshSignature(vec: Column, bits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    (0 until bits).map { j =>
      val s = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * planeSign(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed approximate top-k: candidates share at least one
    * `bandBits`-bit chunk of the hyperplane signature; exact cosine rerank
    * within candidates. Trades recall for replacing the cross join with an
    * equi-join on (chunk, chunk_val) — the 100-TB-shaped plan.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              bits: Int = 32, bandBits: Int = 8): DataFrame = {
    require(bits % bandBits == 0)
    val nChunks = bits / bandBits
    val mask = (1L << bandBits) - 1
    def chunked(df: DataFrame, idAs: String, vecAs: String) =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
                lshSignature(col(vecCol), bits).as("sig"))
        .select(col(idAs), col(vecAs),
          posexplode(array((0 until nChunks).map { c =>
            shiftright(col("sig"), c * bandBits).bitwiseAND(mask)
          }: _*)).as(Seq("chunk", "chunk_val")))
    val c = chunked(corpus, "nbr_id", "nbr_vec")
    val q = chunked(queries, "query_id", "q_vec")
    val cands = c.join(q,
        Seq("chunk", "chunk_val")).where(col("query_id") =!= col("nbr_id"))
      .select("query_id", "q_vec", "nbr_id", "nbr_vec").distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("nbr_id").asc)
    cands
      .select(col("query_id"), col("nbr_id"),
              cosine(col("q_vec"), col("nbr_vec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
