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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
}
