package graft.tools

import org.apache.spark.sql.SparkSession

/** Subset benchmark with the SAME session config and timing methodology
  * as the frozen [[graft.Bench]] (hash-materialization, min over
  * SPARK_GRAFT_REPS interleaved reps), restricted to the query names
  * passed as args — the optimization round's fast inner loop. The
  * driver-contract artifact stays graft.Bench; numbers cited from here
  * are labelled as such in OPTIMIZATION_r07.md.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional conf overrides for A/B experiments: "k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { s =>
      s.split(';').filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"SPARK_GRAFT_EXTRA_CONF entry without '=': $kv")
        }
      }
    }

    try {
      import org.apache.spark.sql.functions._
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.groupBy("r_name").count().collect()
      w.select(xxhash64(struct(w.columns.map(col): _*)).as("h"))
        .agg(sum(col("h").cast("double"))).collect()
      spark.range(100000).select(sum(col("id").cast("double"))).collect()
      graft.gen.Transcripts.turns(spark, sfDir).limit(1000).count()
    } catch { case _: Throwable => () }

    import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(sum(col("h").cast("double"))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val runsByRep = (1 to reps).map { _ =>
      names.map(n => once(graft.SparkEntry.queries(n)))
    }
    names.zipWithIndex.foreach { case (n, i) =>
      val ts = runsByRep.map(_(i))
      println(f"[benchx] $n%-28s min=${ts.min}%7.3f max=${ts.max}%7.3f")
    }
    println(f"[benchx] TOTAL min-sum=${names.indices.map(i => runsByRep.map(_(i)).min).sum}%.3f")
    spark.stop()
  }
}
