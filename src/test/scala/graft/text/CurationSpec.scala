package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Planted-fixture contracts for the corpus-curation kernels: n-gram
  * decontamination, exactly-stratified splitting, repetition features,
  * and mixture epoch weighting (the DuckDB oracle pins them corpus-wide;
  * these pin the semantics on inputs with known answers).
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  test("decontaminate flags exactly the train docs sharing an 8-gram") {
    // bench doc 7 contains the 8-gram "one two three four five six seven eight";
    // train doc 1 embeds the same 8 words contiguously (shifted), doc 2
    // shares only a 7-word run (no 8-gram), doc 3 is disjoint.
    val bench = docsDf(
      (7L, "x one two three four five six seven eight y", "en", "b"))
    val train = docsDf(
      (1L, "pre one two three four five six seven eight post pad", "en", "a"),
      (2L, "one two three four five six seven DIFF tail tail2", "en", "a"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota", "en", "a"))
    val out = Curation.decontaminate(train, bench, n = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, 1L)))
  }

  test("decontaminate counts multiple shared grams and bench docs") {
    // train doc shares a 9-word run with bench doc 10 -> two distinct
    // 8-grams; the same first 8 words also appear in bench doc 11.
    val run = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val bench = docsDf(
      (10L, s"$run tail", "en", "b"),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 other words here", "en", "b"))
    val train = docsDf((1L, s"lead $run close", "en", "a"))
    val Seq((id, hits, benchDocs)) =
      Curation.decontaminate(train, bench, n = 8)
        .as[(Long, Long, Long)].collect().toSeq
    assert(id == 1L && hits == 2L && benchDocs == 2L)
  }

  test("stratifiedSplit is exactly proportional per stratum and deterministic") {
    val docs = docsDf((0L until 20L).map(i =>
      (i, s"text $i", "en", if (i < 10) "srcA" else "srcB")): _*)
    val a = Curation.stratifiedSplit(docs, Seq("lang", "source"))
      .select("doc_id", "source", "rn", "split")
      .as[(Long, String, Int, String)].collect().sortBy(_._1)
    // exactly floor(10/10)=1 val doc in each 10-doc stratum, and it is
    // the rank-1 doc of that stratum
    for (src <- Seq("srcA", "srcB")) {
      val s = a.filter(_._2 == src)
      assert(s.count(_._4 == "val") == 1)
      assert(s.filter(_._4 == "val").map(_._3).toSeq == Seq(1))
    }
    // deterministic: a second evaluation assigns identically
    val b = Curation.stratifiedSplit(docs, Seq("lang", "source"))
      .select("doc_id", "source", "rn", "split")
      .as[(Long, String, Int, String)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("stratifiedSplit honors a custom val fraction") {
    val docs = docsDf((0L until 10L).map(i => (i, "t", "en", "s")): _*)
    val splits = Curation.stratifiedSplit(docs, Seq("source"),
        valNum = 3, valDen = 10)
      .select("split").as[String].collect()
    assert(splits.count(_ == "val") == 3 && splits.count(_ == "train") == 7)
  }

  test("repetition features and threshold") {
    val docs = docsDf(
      (1L, "a b a b a b a b a b", "en", "s"),   // top bigram "a b" 5/9 > 20%
      (2L, "q w e r t y u i", "en", "s"),        // all bigrams unique: 1*5 > 7 false
      (3L, "solo", "en", "s"))                   // no bigrams
    val out = Curation.repetition(docs)
      .as[(Long, Int, Int, Int, Int, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 10, 2, 9, 5, true)))
    assert(out(1) == ((2L, 8, 8, 7, 1, false)))
    assert(out(2) == ((3L, 1, 1, 0, 0, false)))
  }

  test("mixtureEpochs ceiling-divides toward the largest source and caps") {
    val docs = docsDf(
      Seq.tabulate(2)(i => (i.toLong, Seq.fill(50)("w").mkString(" "), "en", "big")) ++
      Seq((10L, Seq.fill(30)("w").mkString(" "), "en", "mid")) ++
      Seq((20L, Seq.fill(10)("w").mkString(" "), "en", "small")): _*)
    val out = Curation.mixtureEpochs(docs, capEpochs = 4)
      .as[(String, Long, Long, Int, Long)].collect().sortBy(_._1)
    // big: 100 tokens -> 1 epoch; mid: ceil(100/30)=4 -> 4; small:
    // ceil(100/10)=10 -> capped at 4
    assert(out.toSeq == Seq(
      ("big", 2L, 100L, 1, 100L),
      ("mid", 1L, 30L, 4, 120L),
      ("small", 1L, 10L, 4, 40L)))
  }

  test("chunk produces stride-spaced windows with a short tail") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9: lengths 4,4,4,1
    val docs = docsDf((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en", "s"))
    val out = Curation.chunk(docs, window = 4, stride = 3)
      .as[(Long, Int, String, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (1L, 0, "t0 t1 t2 t3", 4),
      (1L, 1, "t3 t4 t5 t6", 4),
      (1L, 2, "t6 t7 t8 t9", 4),
      (1L, 3, "t9", 1)))
  }

  test("chunk of a doc shorter than one window is the doc itself") {
    val docs = docsDf((1L, "a b", "en", "s"), (2L, "x", "en", "s"))
    val out = Curation.chunk(docs, window = 8, stride = 8)
      .as[(Long, Int, String, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0, "a b", 2), (2L, 0, "x", 1)))
  }

  test("chunk with stride == window tiles without overlap or loss") {
    val words = (0 until 130).map(i => s"w$i")
    val docs = docsDf((1L, words.mkString(" "), "en", "s"))
    val out = Curation.chunk(docs, window = 64, stride = 64)
      .as[(Long, Int, String, Int)].collect().sortBy(_._2)
    assert(out.map(_._4).toSeq == Seq(64, 64, 2))
    assert(out.flatMap(_._3.split(" ")).toSeq == words)
  }

  test("applyMixture replicates each doc epochs(source) times") {
    val docs = docsDf(
      Seq.tabulate(2)(i => (i.toLong, Seq.fill(50)("w").mkString(" "), "en", "big")) ++
      Seq((10L, Seq.fill(30)("w").mkString(" "), "en", "mid")) ++
      Seq((20L, Seq.fill(10)("w").mkString(" "), "en", "small")): _*)
    val out = Curation.applyMixture(docs, capEpochs = 4)
      .as[(Long, String, Int)].collect()
    // big: 1 epoch x 2 docs; mid: 4 epochs x 1 doc; small: capped 4 x 1
    assert(out.count(_._2 == "big") == 2)
    assert(out.filter(_._1 == 10L).map(_._3).sorted.toSeq == Seq(1, 2, 3, 4))
    assert(out.filter(_._1 == 20L).map(_._3).sorted.toSeq == Seq(1, 2, 3, 4))
    assert(out.length == 10)
  }

  test("wordNgrams emits every start position's gram, row-locally") {
    val docs = docsDf((1L, "a b c d", "en", "s"), (2L, "x", "en", "s"))
    val tri = Curation.wordNgrams(docs, 3)
      .as[(Long, Int, String)].collect().sortBy(t => (t._1, t._2))
    assert(tri.toSeq == Seq((1L, 0, "a b c"), (1L, 1, "b c d")))
    val uni = Curation.wordNgrams(docs, 1)
      .as[(Long, Int, String)].collect().sortBy(t => (t._1, t._2))
    assert(uni.toSeq == Seq((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"),
                            (1L, 3, "d"), (2L, 0, "x")))
  }

  test("wordNgrams takes no shuffle and no window sort") {
    val docs = docsDf((0L until 8L).map(i =>
      (i, (0 until 12).map(j => s"w$j").mkString(" "), "en", "s")): _*)
    val df = Curation.wordNgrams(docs, 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window") &&
           !plan.contains("Sort"),
      s"gram assembly must be row-local (no shuffle/window/sort):\n$plan")
  }

  test("tokenBudgetSelect ranks by score then id and stops at the budget") {
    // stopword ppm: doc0 "the the the w"  -> 3/4   = 750000
    //               doc1 "the w w w"      -> 1/4   = 250000
    //               doc2 "the the w w"    -> 2/4   = 500000
    //               doc3 "w w w w"        -> 0
    // total tokens 16; budget 2/5 -> 6 tokens. Rank: 0 (cum 0, keep),
    // 2 (cum 4, keep), 1 (cum 8, drop), 3 (cum 12, drop).
    val docs = docsDf(
      (0L, "the the the w", "en", "s"), (1L, "the w w w", "en", "s"),
      (2L, "the the w w", "en", "s"), (3L, "w w w w", "en", "s"))
    val out = Curation.tokenBudgetSelect(docs, 2, 5)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 750000L, 4L, 0L, true),
      (1L, 250000L, 4L, 8L, false),
      (2L, 500000L, 4L, 4L, true),
      (3L, 0L, 4L, 12L, false)))
  }

  test("tokenBudgetSelect: banded two-phase equals the single-band form") {
    val docs = docsDf((0L until 60L).map(i =>
      (i, (Seq.fill((i % 7).toInt)("the") ++
           Seq.fill(3 + (i % 5).toInt)("w")).mkString(" "), "en", "s")): _*)
    def run(bw: Long) = Curation.tokenBudgetSelect(docs, 1, 2, bandWidth = bw)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run(50000L) == run(1000000L))
    // ties (equal scores) resolve by ascending id: cum_before is strictly
    // increasing along the (score desc, id) order
    val ordered = run(50000L).sortBy(r => (-r._2, r._1))
    assert(ordered.map(_._4) == ordered.scanLeft(0L)(_ + _._3).init)
  }

  test("tokenBudgetSelect: corpus window is band-partitioned in the plan") {
    val docs = docsDf((0L until 40L).map(i =>
      (i, (Seq.fill((i % 4).toInt)("the") ++ Seq.fill(4)("w"))
        .mkString(" "), "en", "s")): _*)
    val df = Curation.tokenBudgetSelect(docs, 1, 2, bandWidth = 100000L)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("windowspecdefinition\\(band#\\d+L, score_ppm".r
        .findFirstIn(finalPlan).isDefined,
      s"expected a band-partitioned per-doc window:\n$finalPlan")
  }

  test("mixtureEpochs scans the corpus exactly once") {
    val docs = docsDf((0L until 8L).map(i =>
      (i, Seq.fill(5)("w").mkString(" "), "en", s"s${i % 3}")): _*)
    val df = Curation.mixtureEpochs(docs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE prints Final and Initial sections; count scans in the final one
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = "LocalTableScan".r.findAllIn(finalPlan).length
    assert(scans == 1,
      s"expected one corpus scan in the final plan, found $scans:\n$plan")
  }
}
