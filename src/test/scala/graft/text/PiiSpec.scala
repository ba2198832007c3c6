package graft.text

import org.apache.spark.sql.functions._

class PiiSpec extends graft.SparkSuite {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("detect counts emails, IPv4 quads and phones") {
    val df = Pii.detect(one(
      "mail a@b.co and c.d+x@e-f.org, server 10.0.0.1 or 192.168.1.255, " +
        "call +31 6 1234 5678 now"))
    val r = df.select("n_emails", "n_ipv4", "n_phones", "has_pii").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (2L, 2L, 1L, 1L))
  }

  test("clean text has zero counts and survives redaction unchanged") {
    val txt = "no pii here, just words and the number 12345 and v1.2 notation"
    val df = Pii.redact(Pii.detect(one(txt)))
    val r = df.select("has_pii", "redacted").head()
    assert(r.getLong(0) == 0L && r.getString(1) == txt)
  }

  test("redaction replaces every occurrence with typed placeholders") {
    val df = Pii.redact(one(
      "x a@b.co y 10.0.0.1 z +31 6 1234 5678 w second@mail.org"))
    assert(df.select("redacted").head().getString(0) ==
      "x <EMAIL> y <IP> z <PHONE> w <EMAIL>")
  }

  test("PII pass is map-only: no exchange in the plan") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Pii.redact(Pii.detect(d, "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
