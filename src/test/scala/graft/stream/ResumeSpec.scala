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
}
