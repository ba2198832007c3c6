package graft.rdf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triple-pattern query operators over the canonical triple DataFrame —
  * the rdflib `graph.value` / `graph.triples((s, p, o))` surface
  * (razu/meta_resource.py:224-232, cpr.py:29-49) as relational shapes.
  */
object TripleOps {

  /** F4 — point lookup: first object for (subject, predicate).
    * The reference returns the first match (LIMIT 1). */
  def pointLookup(triples: DataFrame, subject: String, predicate: String): Option[String] =
    triples.filter(col("subject") === subject && col("predicate") === predicate)
      .select("objectValue").limit(1)
      .collect().headOption.map(_.getString(0))

  /** F4 (column form) — per-subject first value of a predicate; usable as
    * a join side rather than a driver-side call. */
  def valuesOf(triples: DataFrame, predicate: String,
               as: String = "value"): DataFrame =
    triples.filter(col("predicate") === predicate)
      .groupBy("subject").agg(min("objectValue").as(as))

  /** F5 — graph-wide value lookup: pivot the triple table into one wide
    * row per subject with a column per requested predicate (the shape of
    * cpr.py's repeated graph.value calls). Single shuffle on subject. */
  def pivotValues(triples: DataFrame, predicates: Seq[String]): DataFrame = {
    val wanted = triples.filter(col("predicate").isin(predicates: _*))
    wanted.groupBy("subject")
      .pivot("predicate", predicates)
      .agg(min("objectValue"))
  }

  /** J7 — follow a blank node: (subject, linkPredicate) → bnode →
    * its `valuePredicate` object (cpr.py:36-38 checksum-node walk).
    * Self-join on the bnode id. */
  def followBnode(triples: DataFrame, linkPredicate: String,
                  valuePredicate: String): DataFrame = {
    val links = triples.filter(col("predicate") === linkPredicate
        && col("objectKind") === Triple.BNODE)
      .select(col("subject"), col("objectValue").as("__bnode"))
    val values = triples.filter(col("predicate") === valuePredicate)
      .select(col("subject").as("__bnode"), col("objectValue").as("value"))
    links.join(values, "__bnode").select("subject", "value")
  }

  /** F3 — subjects having at least one `predicate` triple (has-referenced-
    * file predicate, razu/meta_resource.py:104-106): semi-join form. */
  def havingPredicate(triples: DataFrame, predicate: String): DataFrame =
    triples.join(
      triples.filter(col("predicate") === predicate).select("subject").distinct(),
      Seq("subject"), "left_semi")
}
