package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction over a text column — the standard
  * pre-training scrub pass (emails, IPv4 addresses, international
  * phone numbers).
  *
  * Everything is built from `regexp_extract_all` / `regexp_replace`
  * Columns — codegen'd by Catalyst, no UDF — so the pass is map-only:
  * it fuses into whatever scan/projection surrounds it and adds zero
  * shuffles at any scale. Patterns are RE2-compatible (no lookaround,
  * no backreferences), so DuckDB/Trino/Hyperscan-style engines match
  * them identically — the q53 oracle replicates counts AND redacted
  * text byte-for-byte.
  */
object Pii {

  /** user@host.tld — local part then dotted domain with an alpha TLD. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings like 1.2.3.4.5
    * still match only a quad (standard scrubber behavior). */
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International phone: '+' country code then 7-13 digits with
    * spaces/dashes. The mandatory '+' keeps it from swallowing bare
    * numbers and IPv4 quads. */
  val phoneRe = "\\+[0-9]{2}[0-9 -]{6,12}[0-9]"

  private def countOf(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Adds n_emails / n_ipv4 / n_phones / has_pii next to `textCol`. */
  def detect(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_emails", countOf(c, emailRe))
      .withColumn("n_ipv4", countOf(c, ipv4Re))
      .withColumn("n_phones", countOf(c, phoneRe))
      .withColumn("has_pii",
        (col("n_emails") + col("n_ipv4") + col("n_phones") > 0).cast("long"))
  }

  /** Redacted copy of `textCol` (emails first — an email's dotted
    * domain must not be half-eaten by the IPv4 pass). */
  def redactCol(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  def redact(df: DataFrame, textCol: String = "text",
             as: String = "redacted"): DataFrame =
    df.withColumn(as, redactCol(col(textCol)))
}
