package graft.tools

import org.apache.spark.sql.SparkSession
import graft.gen.Transcripts

/** Dev-only scratch main for plan/type inspection (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    val t = Transcripts.turns(spark, "/root/testdata/sf0.001")
    t.printSchema()
    t.orderBy("conv_id", "turn_idx").show(5, false)
    t.coalesce(1).write.mode("overwrite").parquet("/tmp/probe_turns")
    println("rows=" + t.count())
    spark.stop()
  }
}
