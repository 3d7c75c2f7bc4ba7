package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One PII class: a regex that matches it and the placeholder token that
  * replaces every match. Patterns must be lookaround-free (portable
  * across regex engines) and must never match a placeholder token, so a
  * second scrub pass is a no-op (idempotence — RedactionSpec pins it).
  */
final case class PiiClass(name: String, pattern: String, token: String)

/** PII / unsafe-content redaction: the scrub pass every production
  * training-data pipeline runs next to the quality/dedup funnel — regex
  * classes (email, SSN-shaped, phone-shaped digit runs) replaced by
  * placeholder tokens, with per-class COUNTED side outputs instead of
  * silent rewriting (the reference's skip-and-warn reject philosophy:
  * malformed records are counted and surfaced, never silently dropped —
  * gfa2network builders.py:388-394).
  *
  * Scale shape: embarrassingly parallel — one corpus scan, per-row
  * codegen'd `regexp_count` + `regexp_replace` column expressions (no
  * UDFs, no shuffle); the corpus-wide class rollup is one
  * map-side-combinable aggregation over a 3-column projection of the
  * scrubbed relation. At 100 TB the scrub rides whatever scan the
  * quality funnel already pays.
  */
object Redaction {

  /** Order matters: SSN (3-2-4 digit groups) must be scrubbed before the
    * shorter phone shape (3-4) — each class counts and replaces on the
    * text AFTER the previous classes' replacement, so a longer shape is
    * never partially consumed by a shorter one.
    */
  val DefaultClasses: Seq[PiiClass] = Seq(
    PiiClass("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiClass("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    PiiClass("phone", "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>"))

  /** Per-document scrub: (idCol, redacted, n_<class>… , n_pii). Each
    * class's count is the number of matches it redacted; `n_pii` is the
    * total. Rows with n_pii = 0 pass through with text unchanged — the
    * operator is a corpus map, not a filter.
    */
  def scrub(docs: DataFrame, classes: Seq[PiiClass] = DefaultClasses,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(classes.nonEmpty, "redaction needs at least one PII class")
    require(classes.map(_.name).distinct.size == classes.size,
      "PII class names must be unique")
    for (c <- classes; k <- classes)
      require(!java.util.regex.Pattern.compile(c.pattern).matcher(k.token).find(),
        s"class '${c.name}' pattern matches placeholder '${k.token}' — scrub would not be idempotent")
    val start = docs.select(col(idCol), col(textCol).as("__red"))
    classes.foldLeft(start) { (acc, c) =>
      acc
        .withColumn(s"n_${c.name}",
          regexp_count(col("__red"), lit(c.pattern)).cast("int"))
        .withColumn("__red", regexp_replace(col("__red"), c.pattern, c.token))
    }
      .withColumn("n_pii", classes.map(c => col(s"n_${c.name}")).reduce(_ + _))
      .withColumnRenamed("__red", "redacted")
  }

  /** The counted side output, corpus-wide: one row per class with total
    * redacted matches and the number of documents touched. One stack
    * unpivot + one map-side-combinable aggregation — never a second
    * corpus scan if fed the scrubbed relation of [[scrub]].
    */
  def classCounts(scrubbed: DataFrame,
                  classes: Seq[PiiClass] = DefaultClasses): DataFrame = {
    val stacked = classes
      .map(c => s"'${c.name}', n_${c.name}").mkString(", ")
    scrubbed
      .selectExpr(s"stack(${classes.size}, $stacked) AS (class, n)")
      .groupBy("class")
      .agg(sum("n").cast("long").as("n_matches"),
           sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"))
  }
}
