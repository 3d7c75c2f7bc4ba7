package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkSuite

/** Materialization hygiene: version-tagged paths make a stale-schema
  * table from older code invisible to the oracle's multi-tag glob, and
  * crashed writers' staging dirs are swept.
  */
class OracleSigSpec extends SparkSuite {
  import spark.implicits._

  test("materialize writes under a schema-versioned tag and drops stale-version siblings") {
    val sfDir = Files.createTempDirectory("sig_sf").toString
    val tag = OracleSig.tagOf(sfDir)
    assert(tag.endsWith(s"_v${OracleSig.SchemaVersion}"))

    // plant a stale tag from a hypothetical older code version and an
    // orphaned staging dir from a crashed writer
    val stale = Paths.get(OracleSig.Root, "sf_old_v1", "tbl")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val orphan = Paths.get(OracleSig.Root, tag, "tbl.tmp-deadbeef")
    Files.createDirectories(orphan)

    try {
      val back = OracleSig.materialize(spark, sfDir, "tbl", 99L)(
        Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
      assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq ==
             Seq((1L, "a"), (2L, "b")))
      // the stale different-version tag is gone → the glob can never mix schemas
      assert(!Files.exists(stale.getParent))
      // the orphaned staging dir is swept
      assert(!Files.exists(orphan))
      // the table landed at the versioned path with the fp stamp
      val p = OracleSig.path(tag, "tbl")
      val stamped = spark.read.parquet(p)
      assert(stamped.columns.sorted.toSeq == Seq("corpus_fp", "id", "s"))
      assert(stamped.select("corpus_fp").distinct().as[Long].head() == 99L)
      // no leftover tmp dir next to the table
      val sibs = new java.io.File(s"${OracleSig.Root}/$tag").list().toSeq
      assert(!sibs.exists(_.contains(".tmp-")), sibs.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(s"${OracleSig.Root}/$tag"))
    }
  }
}
