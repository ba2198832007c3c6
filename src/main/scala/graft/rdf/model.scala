package graft.rdf

import org.apache.spark.sql.types._

/** Canonical RDF triple — the engine's core data model.
  *
  * Re-expresses the reference's rdflib `Graph` of
  * `(URIRef|BNode, URIRef, URIRef|BNode|Literal)` triples
  * (razu/rdf_resource.py:19,30-31) as a flat Spark row. A graph is a
  * `Dataset[Triple]` / DataFrame with set semantics (rdflib `Graph.add`
  * is idempotent — duplicates collapse on union, razu/rdf_resource.py:25-31).
  *
  * `objectKind` discriminates the object term:
  *   - "uri"     → objectValue is an IRI
  *   - "bnode"   → objectValue is a (skolemized) blank-node id
  *   - "literal" → objectValue is the lexical form; `datatype` (IRI) and
  *                 `lang` (BCP47 tag) optionally qualify it, mirroring
  *                 rdflib `Literal(value, datatype=, lang=)`.
  */
final case class Triple(
    subject: String,
    predicate: String,
    objectValue: String,
    objectKind: String,
    datatype: String,
    lang: String)

object Triple {
  val URI = "uri"
  val BNODE = "bnode"
  val LITERAL = "literal"

  /** Canonical schema, stable column order. Nullability here documents
    * intent (subject/predicate/objectValue/objectKind are never null);
    * Datasets built through the product encoder derive all-nullable
    * string fields, so compare schemas by name+type, not nullability. */
  val schema: StructType = StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("predicate", StringType, nullable = false),
    StructField("objectValue", StringType, nullable = false),
    StructField("objectKind", StringType, nullable = false),
    StructField("datatype", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  val columns: Seq[String] =
    Seq("subject", "predicate", "objectValue", "objectKind", "datatype", "lang")

  def uri(s: String, p: String, o: String): Triple =
    Triple(s, p, o, URI, null, null)
  def bnode(s: String, p: String, o: String): Triple =
    Triple(s, p, o, BNODE, null, null)
  def lit(s: String, p: String, o: String,
          datatype: String = null, lang: String = null): Triple =
    Triple(s, p, o, LITERAL, datatype, lang)
}

/** Namespace constants — port of the reference's prefix table
  * (razu/meta_graph.py:4-13 binds these on every MetaGraph).
  */
object NS {
  val RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val XSD = "http://www.w3.org/2001/XMLSchema#"
  val SKOS = "http://www.w3.org/2004/02/skos/core#"
  val DCT = "http://purl.org/dc/terms/"
  val SCHEMA = "http://schema.org/"
  val GEO = "http://www.opengis.net/ont/geosparql#"
  val PROV = "http://www.w3.org/ns/prov#"
  val OWL = "http://www.w3.org/2002/07/owl#"
  val PREMIS = "http://www.loc.gov/premis/rdf/v3/"
  val LDTO = "https://data.razu.nl/def/ldto/"
  val MDTO = "http://www.nationaalarchief.nl/mdto#"
  val EROR = "http://id.loc.gov/vocabulary/preservation/eventRelatedObjectRole/"
  val ERAR = "http://id.loc.gov/vocabulary/preservation/eventRelatedAgentRole/"
  val EO = "http://id.loc.gov/vocabulary/preservation/eventOutcome/"

  val rdfType: String = RDF + "type"

  val xsdDate: String = XSD + "date"
  val xsdGYear: String = XSD + "gYear"
  val xsdDateTime: String = XSD + "dateTime"
  val xsdInteger: String = XSD + "integer"
  val xsdAnyURI: String = XSD + "anyURI"
  val wktLiteral: String = GEO + "wktLiteral"

  /** prefix → namespace, used by the Turtle/JSON-LD serializers. */
  val prefixes: Seq[(String, String)] = Seq(
    "rdf" -> RDF, "rdfs" -> RDFS, "owl" -> OWL, "xsd" -> XSD, "skos" -> SKOS,
    "dct" -> DCT, "schema" -> SCHEMA, "geo" -> GEO, "prov" -> PROV,
    "premis" -> PREMIS, "ldto" -> LDTO, "mdto" -> MDTO,
    "eror" -> EROR, "erar" -> ERAR, "eo" -> EO)
}
