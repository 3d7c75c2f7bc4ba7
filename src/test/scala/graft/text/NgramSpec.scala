package graft.text

import graft.SparkSuite

/** Contracts for the corpus n-gram count table: exact bigram/trigram
  * counts and doc frequencies on a planted fixture, deterministic
  * tie-breaking, and the row-local gram-generation plan shape (no
  * per-document window over the corpus).
  */
class NgramSpec extends SparkSuite {
  import spark.implicits._

  private val fixture = Seq(
    // "a b" ×2 here (occurrences), 1 doc
    (0L, "a b a b", "s1"),
    // "a b" ×1 here → corpus n_occ 3, n_docs 2
    (1L, "a b c", "s1"),
    (2L, "c c c", "s1"),
    // second source: its own independent top-k
    (3L, "x y", "s2"),
    // one-token doc: zero grams, must not crash or emit
    (4L, "z", "s2")
  ).toDF("doc_id", "text", "source")

  test("bigram counts, doc frequency, and per-source top-k are exact") {
    val out = TextAnalysis.wordNgramTopK(fixture, n = 2, k = 2)
      .as[(String, String, Long, Long, Int)].collect().toSet
    assert(out == Set(
      ("s1", "a b", 3L, 2L, 1),  // beats "c c" (2) and the 1-count grams
      ("s1", "c c", 2L, 1L, 2),
      ("s2", "x y", 1L, 1L, 1))) // the one-token doc contributes nothing
  }

  test("count ties break on the n-gram string (deterministic row set)") {
    val tied = Seq((0L, "b b", "s"), (1L, "a a", "s")).toDF(
      "doc_id", "text", "source")
    val out = TextAnalysis.wordNgramTopK(tied, n = 2, k = 1)
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(out == Seq(("s", "a a", 1L, 1L, 1)))
  }

  test("trigrams via the zip_with fold") {
    val out = TextAnalysis.wordNgramTopK(
        Seq((0L, "a b c d", "s")).toDF("doc_id", "text", "source"),
        n = 3, k = 10)
      .as[(String, String, Long, Long, Int)].collect().toSet
    assert(out.map(_._2) == Set("a b c", "b c d"))
  }

  test("tf-idf keywords: rare terms outrank frequent common terms") {
    // "cat" appears 2× in doc0 but in all 3 docs (df 3 → 666,666 ppm);
    // "rare" appears once in doc0 only (df 1 → 1,000,000 ppm): the
    // rarer term must win despite the lower tf
    val d = Seq(
      (0L, "cat cat rare the"),
      (1L, "cat the the"),
      (2L, "cat the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(d, k = 2)
      .as[(Long, String, Long, Long, Long, Int)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._6).map(r => (r._2, r._5)).toSeq
      }
    assert(out(0L) == Seq(("rare", 1000000L), ("cat", 666666L)))
    // doc1: "the" tf=2 df=3 -> 666,666; "cat" tf=1 df=3 -> 333,333
    assert(out(1L) == Seq(("the", 666666L), ("cat", 333333L)))
    // doc2: tie at 333,333 — term string breaks it deterministically
    assert(out(2L) == Seq(("cat", 333333L), ("the", 333333L)))
  }

  test("plan shape: no per-document window before the aggregation") {
    // gram generation must be row-local (Generate over zip_with output);
    // the only Window in the plan is the per-source top-k AFTER the agg —
    // a corpus-sized sort-by-doc_id window would shuffle the whole input
    val plan = TextAnalysis.wordNgramTopK(fixture)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"))
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      s"top-k window should sit above the aggregate:\n$plan")
  }
}
