package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: run one driver query under configurable session conf
  * (GRAFT_Q, GRAFT_CPUS, GRAFT_PARTS, GRAFT_AQE, GRAFT_SF) and print its
  * materialization time — the conf-sensitivity probe for the iterative
  * kernels' per-round fixed costs.
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("GRAFT_PARTS", cpus)
    val aqe = sys.env.getOrElse("GRAFT_AQE", "true")
    val sf = sys.env.getOrElse("GRAFT_SF", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.range(100000).select(sum(col("id").cast("double"))).collect()
    graft.gen.Transcripts.turns(spark, sf).limit(1000).count()
    val qns = sys.env.getOrElse("GRAFT_Q", "q_bfs_dist").split(",").toSeq
    // interleaved A/B in ONE JVM (spark.sql.adaptive.enabled and
    // shuffle.partitions are runtime confs): between-JVM variance on this
    // host is ±40%, far larger than the effects under test
    // .distinct: with default env both legs are (32, true) — a degenerate
    // "A/B" that would print one pooled series twice as a comparison
    val cfgs = Seq(("32", "true"), (parts, aqe)).distinct
    val acc = scala.collection.mutable.Map[(String, (String, String)), List[Double]]()
      .withDefaultValue(Nil)
    for (rep <- 1 to 3; cfg <- cfgs; qn <- qns) {
      spark.conf.set("spark.sql.shuffle.partitions", cfg._1)
      spark.conf.set("spark.sql.adaptive.enabled", cfg._2)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(qn)(spark, sf)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(sum(col("h").cast("double"))).collect()
      acc((qn, cfg)) = ((System.nanoTime() - t0) / 1e9) :: acc((qn, cfg))
      val _ = rep
    }
    for (qn <- qns; cfg <- cfgs)
      println(f"[planone] $qn parts=${cfg._1} aqe=${cfg._2}: " +
        acc((qn, cfg)).map(t => f"$t%.2f").mkString(" ") +
        f" min=${acc((qn, cfg)).min}%.2f")
    spark.stop()
  }
}
