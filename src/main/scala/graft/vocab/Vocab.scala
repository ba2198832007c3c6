package graft.vocab

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rdf.{NS, Triple}

/** J1 — vocabulary concept resolution with the reference's full
  * label-variant semantics (razu/concept_resolver.py:86-100): a term
  * matches a concept through any of six label predicates
  * (skos:prefLabel | schema:name | rdfs:label | skos:altLabel |
  * schema:identifier | skos:notation), each as a plain literal or
  * language-tagged @nl / @en.
  *
  * The reference fires one SPARQL `LIMIT 1` per distinct term against a
  * live endpoint and `sys.exit(1)`s on a miss (concept_resolver.py:43,114).
  * Here the vocabulary is a triple snapshot reduced ONCE to a one-row-per-
  * term lookup table (deterministic precedence replaces the endpoint's
  * arbitrary first binding), resolution is a broadcast join, and misses
  * surface as a report DataFrame instead of killing the job — at 100 TB a
  * driver exit per unresolved cell is not an option, and the lookup table
  * (vocabulary-sized, not data-sized) is the only broadcast state.
  */
object Vocab {

  /** The six label predicates, in precedence order (the SPARQL property
    * path order of concept_resolver.py:93). */
  val labelPredicates: Seq[String] = Seq(
    NS.SKOS + "prefLabel", NS.SCHEMA + "name", NS.RDFS + "label",
    NS.SKOS + "altLabel", NS.SCHEMA + "identifier", NS.SKOS + "notation")

  /** Language variants, in precedence order: plain, @nl, @en (the UNION
    * order of concept_resolver.py:92-98). */
  val langVariants: Seq[Option[String]] = Seq(None, Some("nl"), Some("en"))

  /** Reduce a vocabulary triple snapshot to a (term, uri) lookup table —
    * exactly one row per distinct term, the winner chosen by
    * (predicate precedence, language precedence, uri) so resolution is
    * deterministic where the reference's `LIMIT 1` is endpoint-dependent.
    * Shape: one aggregation over the (small) vocabulary; the result is
    * the broadcast side of every resolve join.
    */
  def lookupTable(vocabTriples: DataFrame): DataFrame = {
    val predPrec = labelPredicates.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (p, i)) =>
        when(col("predicate") === p, lit(i)).otherwise(acc)
      }
    val langPrec = when(col("lang").isNull, lit(0))
      .when(col("lang") === "nl", lit(1))
      .when(col("lang") === "en", lit(2))
      .otherwise(lit(null).cast("int"))
    vocabTriples
      .filter(col("objectKind") === Triple.LITERAL)
      .withColumn("__prec", predPrec * lit(3) + langPrec)
      .filter(col("__prec").isNotNull) // non-label predicate or other lang
      .select(col("objectValue").as("term"),
        struct(col("__prec"), col("subject").as("uri")).as("__cand"))
      .groupBy("term")
      .agg(min("__cand").as("__best")) // struct min = (prec, uri) lexicographic
      .select(col("term"), col("__best.uri").as("uri"))
  }

  /** Resolve `term` in `df` against a lookup table (from [[lookupTable]]):
    * appends `outCol` with the concept URI, null on a miss. Broadcast
    * equi-join — the lookup side is vocabulary-sized. */
  def resolve(df: DataFrame, term: Column, lookup: DataFrame,
              outCol: String): DataFrame = {
    val lk = broadcast(lookup
      .select(col("term").as(s"__term_$outCol"), col("uri").as(outCol)))
    df.join(lk, term === col(s"__term_$outCol"), "left")
      .drop(s"__term_$outCol")
  }

  /** The collected miss report replacing the reference's fail-fast
    * `sys.exit(1)` (concept_resolver.py:43,114; SURVEY §7 risk 5):
    * distinct unresolved terms with occurrence counts, heaviest first. */
  def missReport(resolved: DataFrame, term: Column,
                 outCol: String): DataFrame =
    resolved.filter(col(outCol).isNull)
      .groupBy(term.as("term"))
      .agg(count(lit(1)).as("n_misses"))
      .orderBy(col("n_misses").desc, col("term"))

  /** One-shot convenience: (resolved-with-outCol, missReport) pair. */
  def resolveWithReport(df: DataFrame, term: Column, vocabTriples: DataFrame,
                        outCol: String): (DataFrame, DataFrame) = {
    val resolved = resolve(df, term, lookupTable(vocabTriples), outCol)
    (resolved, missReport(resolved, term, outCol))
  }
}
