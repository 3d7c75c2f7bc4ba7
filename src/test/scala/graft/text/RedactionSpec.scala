package graft.text

import graft.SparkSuite

/** Planted-fixture contracts for the PII scrub: per-class replacement
  * and counting, class ordering (SSN before phone), mid-text matches,
  * idempotence, and the counted side output.
  */
class RedactionSpec extends SparkSuite {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("scrub replaces every class and counts per class") {
    val docs = docsDf(
      (1L, "mail a.b-c_d%e+f@sub.domain.org now and 123-45-6789 plus 555-0199 end"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io and z@w.co today"))
    val out = Redaction.scrub(docs)
      .select("doc_id", "redacted", "n_email", "n_ssn", "n_phone", "n_pii")
      .as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0) == ((1L,
      "mail <EMAIL> now and <SSN> plus <PHONE> end", 1, 1, 1, 3)))
    assert(out(1) == ((2L, "no pii here at all", 0, 0, 0, 0)))
    assert(out(2) == ((3L, "two mails <EMAIL> and <EMAIL> today", 2, 0, 0, 2)))
  }

  test("SSN is scrubbed before the shorter phone shape can bite it") {
    // "123-45-6789" contains no standalone \d{3}-\d{4}; ordering still
    // matters for "123-4567" adjacency — plant both and check neither
    // class consumes the other's shape
    val docs = docsDf((1L, "a 999-88-7777 b 444-3333 c"))
    val Seq((red, ne, ns, np)) = Redaction.scrub(docs)
      .select("redacted", "n_email", "n_ssn", "n_phone")
      .as[(String, Int, Int, Int)].collect().toSeq
    assert(red == "a <SSN> b <PHONE> c" && ne == 0 && ns == 1 && np == 1)
  }

  test("scrub is idempotent: placeholders are never re-matched") {
    val docs = docsDf((1L, "x u@v.net 111-22-3333 555-1234 y"))
    val once = Redaction.scrub(docs).withColumnRenamed("redacted", "text")
      .select("doc_id", "text")
    val twice = Redaction.scrub(once)
      .select("redacted", "n_pii").as[(String, Int)].head()
    assert(twice == (("x <EMAIL> <SSN> <PHONE> y", 0)))
  }

  test("classCounts rolls up matches and touched docs per class") {
    val docs = docsDf(
      (1L, "a@b.cc and c@d.ee"),      // 2 email matches, 1 doc
      (2L, "e@f.gg plus 555-9999"),   // 1 email + 1 phone
      (3L, "nothing"))
    val out = Redaction.classCounts(Redaction.scrub(docs))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("email", 3L, 2L), ("phone", 1L, 1L), ("ssn", 0L, 0L)))
  }

  test("a class whose pattern matches a placeholder is rejected") {
    intercept[IllegalArgumentException] {
      Redaction.scrub(docsDf((1L, "t")),
        Seq(PiiClass("angle", "<[A-Z]+>", "<HIT>")))
    }
  }
}
