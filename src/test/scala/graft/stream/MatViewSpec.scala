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
    val view = MaterializedView.readView(spark, s"$root/view")
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
    val view = MaterializedView.readView(spark, s"$root/view")
    val batch = MaterializedView.viewDef(spark.createDataset(data).toDF())
    assert(view.exceptAll(batch).isEmpty && batch.exceptAll(view).isEmpty)
  }

  test("bucket-pruned upsert leaves untouched buckets' files byte-identical") {
    val data = SynthTranscripts.turnRows(40, 6)
    val root = tmp("matview_buckets")
    val path = s"$root/view"
    val full = MaterializedView.viewDef(spark.createDataset(data).toDF())
    MaterializedView.upsertBatch(spark, path, full)

    // one conversation's delta → exactly one touched bucket
    val oneConv = data.head.conv_id
    val delta = MaterializedView.viewDef(
      spark.createDataset(data.filter(_.conv_id == oneConv)).toDF())
      .withColumn("n_turns", col("n_turns") + 1000L)
    val touchedBucket = spark.range(1).select(
      pmod(xxhash64(lit(oneConv)), lit(MaterializedView.nBuckets.toLong))
        .cast("int")).head().getInt(0)

    def snapshot(): Map[String, (Long, Long)] = {
      val files = new scala.collection.mutable.ArrayBuffer[java.io.File]
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) f.listFiles().foreach(walk)
        else if (f.getName.endsWith(".parquet")) files += f
      walk(new java.io.File(path))
      files.map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }

    val before = snapshot()
    // the fixture spans multiple buckets, so pruning is non-vacuous
    assert(before.keys.map(p => p.split("bucket=")(1).split("/")(0)).toSet.size > 1)
    MaterializedView.upsertBatch(spark, path, delta)
    val after = snapshot()

    val untouchedBefore = before.filterNot(_._1.contains(s"bucket=$touchedBucket/"))
    val untouchedAfter = after.filterNot(_._1.contains(s"bucket=$touchedBucket/"))
    assert(untouchedBefore == untouchedAfter,
      "untouched bucket partitions must keep the exact same files")
    // the touched bucket WAS rewritten (new file set)
    assert(before.keys.filter(_.contains(s"bucket=$touchedBucket/")).toSet !=
           after.keys.filter(_.contains(s"bucket=$touchedBucket/")).toSet)
    // and the view is the merged result
    val view = MaterializedView.readView(spark, path)
    assert(view.where(col("conv_id") === oneConv).head().getAs[Long]("n_turns") > 1000L)
    assert(view.count() === full.count())
  }
}
