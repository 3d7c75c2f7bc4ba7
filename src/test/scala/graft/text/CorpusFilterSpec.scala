package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Every funnel stage must drop exactly its planted victim — the sf
  * corpora exercise lang + near-dup only (they contain no exact dups and
  * no quality failures), so the stage semantics are pinned here.
  */
class CorpusFilterSpec extends SparkSuite {
  import spark.implicits._

  test("funnel: each stage drops its planted victim, in pipeline order") {
    val docs = Seq(
      (1L, "xyzzy qwfp zxcv plm nbv"),                 // no stopwords → lang
      (2L, "the of and"),                              // <5 tokens → quality
      (3L, "the cat is on the mat today"),
      (4L, "The  cat is on the mat today"),            // exact dup of 3 (case/ws)
      (5L, "the dog is in the house right now it seems"),
      (6L, "the dog is in the house right now it seems honestly")
    ).toDF("doc_id", "text")
    // 5 ≈ 6 by fiat (explicit pair relation — hash-free test); 6 is
    // longer, so 5 is the near-dup casualty
    val pairs = Seq((5L, 6L)).toDF("id_a", "id_b")
    val out = CorpusFilter.funnel(docs, pairs).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Int]("stage_idx"), r.getAs[Long]("n_docs"),
         r.getAs[Long]("n_bytes"))).toMap
    val bytes = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).length.toLong).toMap
    assert(out("total") == ((0, 6L, bytes.values.sum)))
    assert(out("lang")._2 == 5L)                       // 1 dropped
    assert(out("quality")._2 == 4L)                    // 2 dropped
    assert(out("exact_dedup")._2 == 3L)                // 4 dropped (3 kept: min id)
    assert(out("near_dedup") == ((4, 2L,
      bytes(3L) + bytes(6L))))                         // 5 dropped, 6 kept
  }

  test("funnel: near-dup stage only consumes pairs whose BOTH ends survived") {
    // doc 9 fails the lang gate, so its pair with 8 must not delete 8
    val docs = Seq(
      (8L, "the cat is on the mat today"),
      (9L, "qwfp zxcv plm nbv xyzzy")
    ).toDF("doc_id", "text")
    val pairs = Seq((8L, 9L)).toDF("id_a", "id_b")
    val out = CorpusFilter.funnel(docs, pairs).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(out("near_dedup") == 1L)                    // 8 survives alone
  }
}
