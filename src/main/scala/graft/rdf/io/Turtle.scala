package graft.rdf.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.rdf.{NS, Triple}

/** K2 — Turtle serialization of a triple DataFrame
  * (razu/sip.py:47-49, tools/collect_rdf.py:135 `graph.serialize('turtle')`).
  *
  * Deterministic layout (rdflib's is implementation-defined — SURVEY §7
  * pins our own stable layout, graph-equivalence is by triple set):
  * prefix header from NS.prefixes, then one block per subject in sorted
  * order, predicates and objects sorted within the block.
  *
  * Distributed shape: blocks are built per-subject with a typed
  * group-map (compiled), so serialization scales with partitions; only
  * the optional single-file assembly orders globally.
  */
object Turtle {

  private val prefixList: Seq[(String, String)] = NS.prefixes

  /** IRI → prefixed name when a namespace matches and the local part is
    * PN_LOCAL-safe; else <iri>. */
  def term(iri: String): String = {
    prefixList.collectFirst {
      case (p, ns) if iri.startsWith(ns)
        && iri.length > ns.length
        && iri.substring(ns.length).matches("[A-Za-z0-9_][A-Za-z0-9_.-]*")
        && !iri.substring(ns.length).endsWith(".") =>
        s"$p:${iri.substring(ns.length)}"
    }.getOrElse(s"<$iri>")
  }

  /** Turtle literal with escaping, datatype, language. */
  def literal(value: String, datatype: String, lang: String): String = {
    val esc = value.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
    val base = s""""$esc""""
    if (lang != null && lang.nonEmpty) s"$base@$lang"
    else if (datatype != null && datatype.nonEmpty) s"$base^^${term(datatype)}"
    else base
  }

  def objectTerm(value: String, kind: String, datatype: String, lang: String): String =
    kind match {
      case Triple.URI => term(value)
      case Triple.BNODE => if (value.startsWith("_:")) value else s"_:$value"
      case _ => literal(value, datatype, lang)
    }

  private def subjectTerm(s: String): String =
    if (s.startsWith("_:")) s else term(s)

  /** (subject, block) — one Turtle block per subject, content-sorted. */
  def blocks(triples: DataFrame): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples.select(col("subject"), col("predicate"), col("objectValue"),
        col("objectKind"), col("datatype"), col("lang"))
      .as[(String, String, String, String, String, String)]
      .groupByKey(_._1)
      .mapGroups { (subj, it) =>
        val po = it.toSeq
          .map(t => (term(t._2), objectTerm(t._3, t._4, t._5, t._6)))
          .distinct.sorted
        val body = po.map { case (p, o) => s"    $p $o" }
          .mkString(" ;\n")
        (subj, s"${subjectTerm(subj)}\n$body .\n")
      }
      .toDF("subject", "block")
  }

  /** Prefix header lines. */
  def header: String =
    prefixList.map { case (p, ns) => s"@prefix $p: <$ns> ." }
      .mkString("", "\n", "\n\n")

  /** Full document as one string (driver-assembled — for golden tests and
    * single-file parity with the reference's stdout dump). */
  def document(triples: DataFrame): String =
    header + blocks(triples).orderBy("subject")
      .select("block").collect().map(_.getString(0)).mkString("\n")

  /** Single-file write: header then subject-ordered blocks through one
    * text file (repartition(1) + sortWithinPartitions pins the physical
    * line order; the reference emits one file too — shard by subject
    * range instead for a 100 TB dump). */
  def write(triples: DataFrame, path: String): Unit = {
    val spark = triples.sparkSession
    import spark.implicits._
    val body = blocks(triples)
      .select(lit(1).as("ord"), col("subject"), col("block").as("text"))
    val head = Seq((0, "", header.stripSuffix("\n"))).toDF("ord", "subject", "text")
    head.unionByName(body)
      .repartition(1).sortWithinPartitions("ord", "subject")
      .select("text")
      .write.mode("overwrite").text(path)
  }
}
