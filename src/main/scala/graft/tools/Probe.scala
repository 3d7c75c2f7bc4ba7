package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for plan/type/phase inspection (not part of the
  * API). Currently: the redaction-scrub N→4N probe — DocsBench round 6
  * showed scrub_sec 9.8 (local[8]) → 25.9 (local[32]) on the 1M corpus,
  * the only leg that REGRESSED with cores; this isolates it (reps ×3,
  * same augmented view as the DocsBench leg) to split host noise from a
  * genuine contention effect (regex scrub is allocation-heavy — the
  * suspect is GC pressure at 32 concurrent string-rewriting tasks on
  * the shared 4 GiB sbt heap).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("GRAFT_PROBE_CPUS", "8").toInt
    val n = sys.env.getOrElse("GRAFT_DOCS_N", "1000000").toLong
    val mode = sys.env.getOrElse("GRAFT_PROBE", "scrub")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (mode == "semdedup") { semdedupProbe(spark, cpus); return }
    val docs = spark.read.parquet(s"/tmp/graft_docsbench/$n")
    docs.count() // warm scan
    val pii = docs.select(col("doc_id"), concat(
        when(col("doc_id") % 5 === 2, concat(lit("call "),
          lpad(pmod(col("doc_id") * 7, lit(1000L)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" "))).otherwise(lit("")),
        col("text"),
        when(col("doc_id") % 3 === 0, concat(lit(" reach user"),
          pmod(col("doc_id"), lit(100L)).cast("string"), lit("@mail.com")))
          .otherwise(lit(""))).as("text"))
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val s = graft.text.Redaction.scrub(pii)
        .agg(sum("n_pii")).collect()(0).getLong(0)
      println(f"[probe] cpus=$cpus rep=$rep scrub=${(System.nanoTime() - t0) / 1e9}%.2f s (n_pii=$s)")
    }
    spark.stop()
  }

  /** Phase split of the DocsBench SemDeDup leg (its combined 8→32 ratio
    * sits at 0.63-of-ceiling): k-means TRAIN is sample-sized and
    * iterative (per-iteration driver rounds — a fixed floor that the
    * 100k-vector leg cannot amortize), while ASSIGN + within-cluster
    * PAIR VERDICTS are the corpus-proportional phases. At production
    * scale train is amortized over the corpus snapshot; this probe
    * reports the two phases separately so the scaling claim lands on
    * the phase that actually grows with data.
    */
  private def semdedupProbe(spark: SparkSession, cpus: Int): Unit = {
    val nVec = sys.env.getOrElse("GRAFT_PROBE_VECS", "100000").toLong
    val seedv = when(col("vec_id") % 11 === 0 && col("vec_id") > 0,
                     col("vec_id") - 1).otherwise(col("vec_id"))
    val embn = spark.range(nVec).toDF("vec_id").select(col("vec_id"),
      transform(sequence(lit(1), lit(16)), d =>
        (pmod(xxhash64(seedv, d), lit(2000L)).cast("float") / lit(1000f)
          - lit(1f)).cast("float")).as("embedding"))
      .localCheckpoint(true) // generation off the timed path
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (rep <- 1 to 2) {
      val (cents, tTrain) = time {
        graft.sim.Ivf.trainCentroids(embn, nClusters = 256, iters = 2,
          sampleFactor = 25).localCheckpoint(true)
      }
      val (assign, tAssign) = time {
        graft.sim.Ivf.assign(
          embn.select(col("vec_id").as("id"), col("embedding").as("v")),
          cents).localCheckpoint(true)
      }
      val (nDrop, tPairs) = time {
        graft.text.Dedup.semanticDedupFromAssign(embn, assign,
          threshold = 0.9).where(col("dropped")).count()
      }
      println(f"[probe] cpus=$cpus rep=$rep semdedup train=$tTrain%.2f " +
        f"assign=$tAssign%.2f pairs=$tPairs%.2f (dropped=$nDrop)")
    }
    spark.stop()
  }
}
