package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for plan/type/phase inspection (not part of the
  * API). Currently: IVF phase timing at the bench workload shape.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.count() // warm scan
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
      time(label) {
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(sum(col("h").cast("double"))).collect()
      }
    // candidate volume per param set: how much of the corpus does a
    // nprobe probe actually rerank?
    for ((nc, np, sf0) <- Seq((16, 4, 100), (32, 4, 25), (64, 8, 25))) {
      val c = graft.sim.Ivf.trainCentroids(e, nClusters = nc, iters = 2,
                                           sampleFactor = sf0)
      c.count()
      val lists = graft.sim.Ivf.invertedLists(e, c)
      val sizes = lists.groupBy("cluster_id").count()
        .agg(min("count"), max("count"), avg("count")).collect()(0)
      println(s"[probe] nc=$nc sizes min=${sizes.get(0)} max=${sizes.get(1)} avg=${sizes.get(2)}")
      mat(s"ivfTopK full nc=$nc np=$np sf=$sf0")(
        graft.sim.Ivf.ivfTopK(e, e, 5, nClusters = nc, nprobe = np, iters = 2,
                              simDecimals = 6, sampleFactor = sf0))
    }
    mat("bruteTopK")(graft.sim.Knn.bruteTopK(e, e, 5, simDecimals = 6))
    // recall at the candidate driver params
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("query_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(graft.sim.Knn.bruteTopK(e, e, 5, simDecimals = 6))
    for ((nc, np, sf0) <- Seq((32, 8, 25), (64, 16, 25), (64, 8, 25))) {
      val t0 = System.nanoTime()
      val ivf = pairs(graft.sim.Ivf.ivfTopK(e, e, 5, nClusters = nc,
        nprobe = np, iters = 2, simDecimals = 6, sampleFactor = sf0))
      println(f"[probe] recall nc=$nc np=$np sf=$sf0: " +
        f"${(brute intersect ivf).size.toDouble / brute.size}%.4f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    spark.stop()
  }
}
