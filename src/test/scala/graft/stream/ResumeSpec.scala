package graft.stream

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.gen.SynthTranscripts

/** T8/T9 end-to-end: ingest → idempotent sink with checkpoint, kill the
  * query, append more input, restart from the same checkpoint — the sink
  * table must hold every turn exactly once (SURVEY §5 test 5).
  */
class ResumeSpec extends SparkSuite {
  import spark.implicits._

  test("checkpoint resume: exactly-once on (conv_id, turn_idx) across restart") {
    val root = java.nio.file.Files.createTempDirectory("resume").toString
    val src = s"$root/src"
    val table = s"$root/table"
    val ckpt = s"$root/ckpt"
    val lineage = s"$root/lineage"

    val all = SynthTranscripts.turnRows(6, 8)
    val (part1, part2) = all.splitAt(all.length / 2)
    spark.createDataset(part1).toDF()
      .write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    def startQuery() = TranscriptSink.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "2")
        .parquet(src),
      table, ckpt, Some(lineage))

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(table).count() == part1.length)

    // new files arrive while the query is down
    spark.createDataset(part2).toDF().write.mode("append").parquet(src)
    // ... and some of part1 is duplicated at the source (at-least-once
    // upstream delivery) — the keyed sink must still be exactly-once
    spark.createDataset(part1.take(10)).toDF().write.mode("append").parquet(src)

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val sunk = spark.read.parquet(table)
    assert(sunk.count() == all.length,
      s"expected ${all.length}, got ${sunk.count()}")
    assert(sunk.groupBy("conv_id", "turn_idx").count()
      .where(col("count") > 1).isEmpty)
    // content parity: every (conv_id, turn_idx, text) matches the input
    val expect = spark.createDataset(all).toDF()
      .select("conv_id", "turn_idx", "text")
    val got = sunk.select("conv_id", "turn_idx", "text")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    // lineage covers all batches with nonzero rows
    assert(Lineage.read(spark, lineage).agg(sum("row_count")).head().getLong(0)
      >= all.length)
  }

  test("CSR keyed state survives checkpoint restart (flatMapGroupsWithState recovery)") {
    import graft.schema.Turn
    val root = java.nio.file.Files.createTempDirectory("csr_resume").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"

    // time-sorted halves: conversations STRADDLE the restart, so their
    // final summaries are correct only if the keyed state written before
    // the stop is recovered from the checkpoint by the second query
    val all = SynthTranscripts.turnRows(5, 12).sortBy(_.ts.getTime)
    val (part1, part2) = all.splitAt(all.length / 2)
    def append(rows: Seq[Turn]): Unit =
      spark.createDataset(rows).coalesce(1).toDF()
        .write.mode("append").parquet(src)
    append(part1)

    val schema = spark.read.parquet(src).schema
    // idle timeout above any intra-conversation gap (~42 min max in the
    // generator) so the restart's watermark jump can't mid-finalize a
    // straddler; sentinels a day+ out finalize everything at the end
    def startQuery() = CsrState.attach(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(src).as[Turn].withWatermark("ts", "1 minute"),
        idleTimeout = "2 hours")
      .toDF().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()

    val maxTs = all.last.ts.getTime
    append(part2)
    append(Seq(Turn("zzz1", 0, "user", "s", None,
      new java.sql.Timestamp(maxTs + 86400000L))))
    append(Seq(Turn("zzz2", 0, "user", "s", None,
      new java.sql.Timestamp(maxTs + 2 * 86400000L))))

    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()

    val finals = spark.read.parquet(out)
      .where(col("is_final") && !col("conv_id").startsWith("zzz"))
    // exactly one final per conversation — lost state would split a
    // straddler into two partial finals (or drop its first half)
    assert(finals.groupBy("conv_id").count().where(col("count") > 1).isEmpty)
    // finals must equal the batch aggregator over the FULL input
    val expect = spark.createDataset(all)
      .groupByKey(_.conv_id)
      .agg(graft.ops.ConvCsrAggregator.toColumn.name("csr"))
      .select(col("key").as("conv_id"), col("csr.n_turns"),
              col("csr.n_edges"), col("csr.min_idx"), col("csr.max_idx"),
              col("csr.contiguous"))
    val got = finals.select("conv_id", "n_turns", "n_edges", "min_idx",
                            "max_idx", "contiguous")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() == 5)
  }
}
