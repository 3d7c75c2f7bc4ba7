package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.gen.DistributedTranscripts
import graft.schema.Turn
import graft.stream.CsrState

/** Hot-key skew A/B for the stateful CSR path: the same mega-conversation
  * input (one conversation carrying ~half the rows — the pathological
  * hot key) through `CsrState.attach` (raw rows into keyed state) vs
  * `CsrState.attachSalted` (map-side partial aggregation per input
  * partition before the state shuffle). Prints one JSON line per variant
  * with wall seconds and turns/sec; numbers go to BENCH.md.
  */
object SaltBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "20000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-salt-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // one mega-conversation (hotFactor × baseTurns turns) + nConvs normal
    // ones: conv0 holds ~half of all rows
    val inputDir = Files.createTempDirectory("graft_salt_in").toString
    DistributedTranscripts
      .turns(spark, nConvs, baseTurns = 24,
             hotEvery = Int.MaxValue, hotFactor = 1)
      .union(DistributedTranscripts
        .turns(spark, 1, baseTurns = 24, seed = 7L,
               hotEvery = 1, hotFactor = nConvs.toInt))
      .write.mode("overwrite").parquet(inputDir)
    val total = spark.read.parquet(inputDir).count()

    def run(salted: Boolean): Double = {
      val ckpt = Files.createTempDirectory("graft_salt_ck").toString
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Turn]].schema)
        .parquet(inputDir)
        .as[Turn]
      val out = if (salted) CsrState.attachSalted(src, "1 hour")
                else CsrState.attach(src.withWatermark("ts", "10 minutes"), "1 hour")
      val t0 = System.nanoTime()
      val q = out.toDF().writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    run(salted = false) // warmup (codegen/classloading), not measured
    for (salted <- Seq(false, true)) {
      val sec = run(salted)
      val label = if (salted) "csr_salted" else "csr_plain"
      println(f"""{"metric":"$label","value":$sec%.3f,"unit":"sec","turns":$total,"turns_per_sec":${total / sec}%.0f,"cpus":$cpus}""")
    }
    spark.stop()
  }
}
