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

    // plant a stale tag from a hypothetical older code version, an OLD
    // orphaned staging dir (a crashed writer — must be swept), and a
    // FRESH staging dir (a possibly-live concurrent writer mid-swap —
    // the age-gated sweep must leave it alone)
    val stale = Paths.get(OracleSig.Root, "sf_old_v1", "tbl")
    Files.createDirectories(stale)
    Files.write(stale.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val orphan = Paths.get(OracleSig.Root, tag, "tbl.tmp-deadbeef")
    Files.createDirectories(orphan)
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val live = Paths.get(OracleSig.Root, tag, "tbl.tmp-cafebabe")
    Files.createDirectories(live)

    try {
      val back = OracleSig.materialize(spark, sfDir, "tbl", 99L)(
        Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
      assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq ==
             Seq((1L, "a"), (2L, "b")))
      // the stale different-version tag is gone → the glob can never mix schemas
      assert(!Files.exists(stale.getParent))
      // the old orphaned staging dir is swept; the fresh one survives
      assert(!Files.exists(orphan))
      assert(Files.exists(live))
      // the table landed at the versioned path with the fp stamp
      val p = OracleSig.path(tag, "tbl")
      val stamped = spark.read.parquet(p)
      assert(stamped.columns.sorted.toSeq == Seq("corpus_fp", "id", "s"))
      assert(stamped.select("corpus_fp").distinct().as[Long].head() == 99L)
      // no leftover tmp/aside dir from OUR write next to the table
      // (the planted fresh staging dir is the one sanctioned survivor)
      val sibs = new java.io.File(s"${OracleSig.Root}/$tag").list().toSeq
      assert(sibs.filter(s => s.contains(".tmp-") || s.contains(".old-"))
               == Seq("tbl.tmp-cafebabe"), sibs.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(s"${OracleSig.Root}/$tag"))
    }
  }
}
