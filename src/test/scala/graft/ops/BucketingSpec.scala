package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.gen.SynthTranscripts

/** Bucketing evidence (the "repartition()/bucketing for co-located
  * joins" scale technique): two tables bucketed + sorted on conv_id with
  * the same bucket count join AND aggregate WITHOUT any shuffle exchange
  * — at 100 TB this is the difference between re-shuffling the fact
  * table on every conv-keyed join and reading co-located buckets in
  * place. (The driver's parquet inputs are unbucketed by contract, so
  * this lives as plan-level evidence rather than a driver query.)
  */
class BucketingSpec extends SparkSuite {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("bucketed+sorted tables: conv-keyed join and agg run shuffle-free") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_buckets")
    warehouse.toFile.deleteOnExit()
    val t = SynthTranscripts.turns(spark, 40, 8).toDF()
    Seq("graft_bkt_turns", "graft_bkt_convs").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
    t.write.bucketBy(8, "conv_id").sortBy("conv_id")
      .option("path", s"$warehouse/turns").saveAsTable("graft_bkt_turns")
    t.groupBy("conv_id").agg(count(lit(1)).as("n"))
      .write.bucketBy(8, "conv_id").sortBy("conv_id")
      .option("path", s"$warehouse/convs").saveAsTable("graft_bkt_convs")
    // disable broadcast so the join exercises the bucketed sort-merge
    // path (a broadcast would hide whether co-location works); assert on
    // SHUFFLE exchanges — hashpartitioning — a BroadcastExchange is not
    // the cost bucketing removes
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def shuffles(p: String): Int =
      "Exchange hashpartitioning".r.findAllIn(p).length
    try {
      val a = spark.table("graft_bkt_turns")
      val d = spark.table("graft_bkt_convs")
      // co-located join: both sides bucketed on the join key, same count
      val joined = a.join(d, "conv_id").where(col("n") >= 1)
      val jp = planOf(joined)
      assert(jp.contains("SortMergeJoin"), s"expected SMJ:\n$jp")
      assert(shuffles(jp) === 0, s"bucketed join still shuffles:\n$jp")
      assert(joined.count() === a.count())
      // bucket-local aggregation: groupBy on the bucket key needs no
      // exchange either
      val agg = a.groupBy("conv_id").agg(count(lit(1)).as("m"))
      val ap = planOf(agg)
      assert(shuffles(ap) === 0, s"bucket-keyed agg still shuffles:\n$ap")
      // and the result is right
      val parity = agg.join(d, "conv_id").where(col("m") =!= col("n")).count()
      assert(parity === 0L)
      // control: the same join over the UNBUCKETED source does shuffle —
      // the assertion above is meaningful, not vacuous
      val control = t.join(d, "conv_id")
      assert(shuffles(planOf(control)) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      Seq("graft_bkt_turns", "graft_bkt_convs").foreach(n =>
        spark.sql(s"DROP TABLE IF EXISTS $n"))
    }
  }
}
