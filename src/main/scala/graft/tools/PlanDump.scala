package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` output for every BATCH query in
  * [[graft.SparkEntry.queries]] to plans/<tag>/<query>_<suffix>.txt — the
  * optimization-round evidence trail (guide §1: capture the plan shape
  * before and after every change).
  *
  * Streaming queries (q_stream_*) execute their micro-batch pipeline
  * during DataFrame construction and return a sink-table read, so their
  * "plan" is a dimension-sized memory/parquet scan — skipped here; their
  * plan evidence is the streaming-progress metrics instead.
  *
  * Usage: SPARK_GRAFT_PLAN_TAG=r07 SPARK_GRAFT_PLAN_SUFFIX=before \
  *          sbt "runMain graft.tools.PlanDump [queryName ...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r07")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    val wanted: Set[String] = args.toSet
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .filter(n => wanted.isEmpty || wanted.contains(n))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plandump] $name -> plans/$tag/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
