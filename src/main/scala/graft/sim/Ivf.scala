package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VecFunctions.vec_dot

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path of the similarity-search family next to [[Knn.lshTopK]]:
  * a spherical-k-means coarse quantizer partitions the corpus into
  * `nClusters` inverted lists; queries probe the `nprobe` nearest
  * centroids and rerank exactly within those lists only.
  *
  * Everything is deterministic (hash-ordered initialization, fixed Lloyd
  * iteration count) and distributed: training assigns via a broadcast
  * centroid table + min_by, centroid updates are a posexplode → per-dim
  * mean → rebuild (no driver-side vectors); the search is two broadcast
  * joins and a map-side-combinable top-k — no shuffle ever carries the
  * corpus more than once.
  */
object Ivf {

  private def cos(a: Column, b: Column): Column =
    vec_dot(a, b) / (sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)))

  /** Train `nClusters` spherical-k-means centroids (cosine assignment,
    * per-dimension mean update, `iters` Lloyd rounds). Initialization is
    * the `nClusters` corpus vectors with the smallest xxhash64(id) —
    * deterministic, no RNG. Returns (cluster_id, centroid: array<float>).
    */
  def trainCentroids(corpus: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     nClusters: Int = 16, iters: Int = 3): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // hash-ordered deterministic init; the global window is over the
    // nClusters-row dimension table only (post-limit), not the corpus
    var centroids = vecs
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(nClusters)
      .withColumn("cluster_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(xxhash64(col("id")), col("id"))).cast("int"))
      .select(col("cluster_id"), col("v").as("centroid"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val assigned = assign(vecs, centroids)
      val updated = assigned
        .join(vecs, Seq("id"))
        .select(col("cluster_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster_id", "dim")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cluster_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m").cast("float")).as("centroid"))
      centroids = updated.localCheckpoint(true)
      i += 1
    }
    vecs.unpersist(blocking = false)
    centroids
  }

  /** Hard assignment: nearest centroid by cosine (broadcast centroids,
    * min_by over the small cluster dimension). Returns (id, cluster_id).
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("id"), col("cluster_id"),
              cos(col("v"), col("centroid")).as("sim"))
      .groupBy("id")
      .agg(expr("max_by(cluster_id, struct(sim, -cluster_id))").as("cluster_id"))

  /** IVF approximate top-k: probe the `nprobe` nearest inverted lists per
    * query, exact cosine rerank within them via the map-side-combinable
    * [[graft.ops.TopKByScore]] (only keys×k rows cross the final shuffle).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nClusters: Int = 16, nprobe: Int = 4, iters: Int = 3,
              simDecimals: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = trainCentroids(corpus, idCol, vecCol, nClusters, iters)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lists = assign(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), centroids)
      .withColumnRenamed("id", "nbr_id")
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("q_norm", sqrt(vec_dot(col("q_vec"), col("q_vec"))))
    val probes = qv.select(col("query_id"), col("q_vec").as("v")).crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cluster_id"),
              cos(col("v"), col("centroid")).as("csim"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("csim").desc, col("cluster_id").asc)))
      .where(col("r") <= nprobe)
      .select("query_id", "cluster_id")
    val cv = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .withColumn("nbr_norm", sqrt(vec_dot(col("nbr_vec"), col("nbr_vec"))))
      .join(lists, Seq("nbr_id"))
    val sim = (vec_dot(col("q_vec"), col("nbr_vec")) /
      (col("q_norm") * col("nbr_norm"))).as("sim")
    val rankKey =
      if (simDecimals >= 0) round(col("sim"), simDecimals) else col("sim")
    val scored = cv.join(broadcast(probes), Seq("cluster_id"))
      .join(broadcast(qv), Seq("query_id"))
      .where(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"), sim)
      .select(col("query_id"), col("nbr_id"), rankKey.as("key"), col("sim"))
      .as[graft.ops.ScoredRow]
    val out = scored.groupByKey(_.query_id)
      .agg(new graft.ops.TopKByScore(k).toColumn.name("top"))
      .select(col("key").as("query_id"),
              posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.nbr_id").as("nbr_id"),
              col("e.sim").as("sim"), (col("pos") + 1).cast("int").as("rank"))
    out
  }
}
