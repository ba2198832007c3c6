package graft.vocab

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.rdf.{NS, Triple}

/** Pins the label-variant resolver to the reference's matching semantics
  * (razu/concept_resolver.py:86-100): 6 predicates x {plain, @nl, @en},
  * deterministic prefLabel-first precedence, collected miss report. */
class VocabSpec extends SparkSuite {
  import spark.implicits._

  private def vocabDf(ts: Triple*) = ts.toDF()

  test("every predicate and language variant resolves") {
    val vocab = vocabDf(
      Triple.lit("urn:c1", NS.SKOS + "prefLabel", "pref-term"),
      Triple.lit("urn:c2", NS.SCHEMA + "name", "name-term", lang = "nl"),
      Triple.lit("urn:c3", NS.RDFS + "label", "label-term", lang = "en"),
      Triple.lit("urn:c4", NS.SKOS + "altLabel", "alt-term", lang = "nl"),
      Triple.lit("urn:c5", NS.SCHEMA + "identifier", "id-term"),
      Triple.lit("urn:c6", NS.SKOS + "notation", "42"))
    val lookup = Vocab.lookupTable(vocab).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lookup == Map(
      "pref-term" -> "urn:c1", "name-term" -> "urn:c2",
      "label-term" -> "urn:c3", "alt-term" -> "urn:c4",
      "id-term" -> "urn:c5", "42" -> "urn:c6"))
  }

  test("unsupported languages and non-label predicates are excluded") {
    val vocab = vocabDf(
      Triple.lit("urn:de", NS.SKOS + "prefLabel", "term-de", lang = "de"),
      Triple.lit("urn:other", NS.DCT + "title", "term-title"),
      Triple.uri("urn:u", NS.SKOS + "prefLabel", "term-uri-object"))
    assert(Vocab.lookupTable(vocab).isEmpty)
  }

  test("precedence: prefLabel beats altLabel, plain beats @nl, uri ties break ascending") {
    val vocab = vocabDf(
      Triple.lit("urn:alt", NS.SKOS + "altLabel", "shared"),
      Triple.lit("urn:pref", NS.SKOS + "prefLabel", "shared"),
      Triple.lit("urn:nl", NS.SKOS + "prefLabel", "tagged", lang = "nl"),
      Triple.lit("urn:plain", NS.SKOS + "prefLabel", "tagged"),
      Triple.lit("urn:b", NS.SKOS + "prefLabel", "tie"),
      Triple.lit("urn:a", NS.SKOS + "prefLabel", "tie"))
    val lookup = Vocab.lookupTable(vocab).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lookup("shared") == "urn:pref")
    assert(lookup("tagged") == "urn:plain")
    assert(lookup("tie") == "urn:a")
  }

  test("resolveWithReport: hits resolve, misses are counted heaviest-first") {
    val vocab = vocabDf(
      Triple.lit("urn:c1", NS.SKOS + "prefLabel", "known"))
    val df = Seq("known", "missing-a", "missing-b", "missing-b")
      .toDF("term")
    val (resolved, report) =
      Vocab.resolveWithReport(df, col("term"), vocab, "uri")
    assert(resolved.filter(col("uri") === "urn:c1").count() == 1)
    val misses = report.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(misses.toSeq == Seq(("missing-b", 2L), ("missing-a", 1L)))
  }

  test("resolution join broadcasts the lookup side") {
    val vocab = vocabDf(Triple.lit("urn:c1", NS.SKOS + "prefLabel", "known"))
    val df = Seq("known").toDF("term")
    val p = Vocab.resolve(df, col("term"), Vocab.lookupTable(vocab), "uri")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
