package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.gen.SynthTranscripts
import graft.schema.Turn

class MatViewSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String) = {
    val p = java.nio.file.Files.createTempDirectory(tag)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("update-mode deltas + replace-on-match upserts == batch aggregate") {
    val data = SynthTranscripts.turnRows(25, 10)
    val ms = MemoryStream[Turn](
      implicitly[org.apache.spark.sql.Encoder[Turn]], spark.sqlContext)
    val root = tmp("matview")
    val q = MaterializedView.start(ms.toDF(), s"$root/view", s"$root/ckpt")
    // event-time-sorted halves → conversations straddle the split, so
    // their key is upserted twice and the second write must win
    val sorted = data.sortBy(_.ts.getTime)
    val (b1, b2) = sorted.splitAt(sorted.length / 2)
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val view = spark.read.parquet(s"$root/view")
    val batch = MaterializedView.viewDef(spark.createDataset(data).toDF())
    assert(view.exceptAll(batch).isEmpty && batch.exceptAll(view).isEmpty)
    // the fixture genuinely exercises the replace path
    val straddling = b1.map(_.conv_id).toSet.intersect(b2.map(_.conv_id).toSet)
    assert(straddling.nonEmpty)
  }

  test("kill/restart mid-feed: checkpoint recovery + upsert idempotence keep the view exact") {
    val data = SynthTranscripts.turnRows(25, 10, seed = 7L)
    val ms = MemoryStream[Turn](
      implicitly[org.apache.spark.sql.Encoder[Turn]], spark.sqlContext)
    val root = tmp("matview_restart")
    def start() = MaterializedView.start(ms.toDF(), s"$root/view", s"$root/ckpt")
    val sorted = data.sortBy(_.ts.getTime)
    val (b1, b2) = sorted.splitAt(sorted.length / 2)
    val q1 = start()
    try { ms.addData(b1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { ms.addData(b2); q2.processAllAvailable() } finally q2.stop()
    val view = spark.read.parquet(s"$root/view")
    val batch = MaterializedView.viewDef(spark.createDataset(data).toDF())
    assert(view.exceptAll(batch).isEmpty && batch.exceptAll(view).isEmpty)
  }
}
