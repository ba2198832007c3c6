package graft.vocab

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf.Triple

/** The endpoint half of J1: materialize the vocabulary snapshot that
  * [[Vocab.lookupTable]] consumes from a live SPARQL endpoint.
  *
  * The reference resolves each term with its own HTTP `SELECT ... LIMIT 1`
  * round trip (razu/concept_resolver.py:86-114) — one blocking request
  * per distinct cell value, driver-side, `sys.exit(1)` on failure. At
  * scale the correct shape is the opposite: ONE snapshot query pulls all
  * label triples for the vocabulary, the response lands as files, and
  * parsing + reduction + resolution are distributed. This object supplies
  * the three pieces:
  *
  *  1. [[labelSnapshotQuery]] — the single SELECT that fetches every
  *     (concept, labelPredicate, label) binding the per-term query could
  *     ever match (same six predicates, same three language variants).
  *  2. [[fetchToFile]] — a driver-side HTTP POST of that query
  *     (`application/sparql-results+json`), saved to a file. One call
  *     per vocabulary, not per term.
  *  3. [[read]] / [[labelTriples]] — distributed parse of the standard
  *     SPARQL 1.1 Query Results JSON Format (W3C REC, the format
  *     SPARQLWrapper's JSON mode returns) into a DataFrame; label
  *     results convert to the Triple shape [[Vocab.lookupTable]] reduces.
  *
  * Everything except the HTTP call is exercisable offline from saved
  * responses, which is also the right production posture: snapshot
  * fetches are scheduled and versioned, query-time resolution never
  * touches the network.
  */
object SparqlSnapshot {

  /** One query to replace them all: every concept with any of the six
    * label predicates in a plain, @nl, or @en variant. The property list
    * and language set mirror concept_resolver.py:92-98; the per-term
    * `"term"` constant is replaced by an unconstrained `?label`, so one
    * response covers every term the dataset could mention. */
  def labelSnapshotQuery: String = {
    s"""SELECT ?uri ?p ?label WHERE {
       |  ?uri ?p ?label .
       |  FILTER(?p IN (${Vocab.labelPredicates.map(p => s"<$p>").mkString(", ")}))
       |  FILTER(LANG(?label) IN ("", "nl", "en"))
       |}""".stripMargin
  }

  /** Driver-side snapshot fetch: POST the query to the endpoint, save
    * the JSON response body to `dest`. Standard SPARQL protocol
    * (`query=` form parameter, results-JSON accept header) via the JDK
    * HTTP client — no library dependency. Returns the byte count.
    * Network use is deployment-side; tests exercise [[read]] on saved
    * response files instead. */
  def fetchToFile(endpoint: String, query: String,
                  dest: java.nio.file.Path,
                  timeout: java.time.Duration =
                    java.time.Duration.ofMinutes(5)): Long = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout).build()
    val form = "query=" + java.net.URLEncoder.encode(query, "UTF-8")
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Accept", "application/sparql-results+json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(form))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofFile(dest))
    if (resp.statusCode() / 100 != 2)
      sys.error(s"SPARQL endpoint $endpoint returned ${resp.statusCode()}")
    java.nio.file.Files.size(dest)
  }

  /** Distributed parse of SPARQL results JSON files (glob ok) into long
    * format: one row per (binding row, variable) with the term's type
    * split out — (doc_id, row_id, var, value, kind, datatype, lang),
    * where kind is `uri` / `literal` / `bnode` per the W3C term encoding
    * and (doc_id, row_id) identifies a binding row ACROSS paged response
    * files (row_id alone restarts per document). Each file is one JSON
    * document (wholetext read, one task per file — snapshot responses
    * are vocabulary-sized; shard giant vocabularies across multiple
    * paged fetches for parallelism). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path)
      .mapPartitions(_.flatMap { doc =>
        val docId = graft.text.Dedup.xxhash64String(doc)
        parseResults(doc).map { case (row, v, value, kind, dt, lang) =>
          (docId, row, v, value, kind, dt, lang)
        }
      })
      .toDF("doc_id", "row_id", "var", "value", "kind", "datatype", "lang")
  }

  /** Rows of one results document, long format. Exposed for single-doc
    * use; [[read]] is the distributed entry. */
  def parseResults(json: String): Seq[(Long, String, String, String, String, String)] = {
    val root = new ObjectMapper().readTree(json)
    val bindings = root.path("results").path("bindings")
    require(bindings.isArray,
      "not a SPARQL results document: missing results.bindings array")
    val out = Seq.newBuilder[(Long, String, String, String, String, String)]
    var i = 0L
    bindings.forEach { row =>
      row.properties().forEach { e =>
        val term: JsonNode = e.getValue
        out += ((i, e.getKey, term.path("value").asText(),
          term.path("type").asText() match {
            case "typed-literal" => "literal" // SPARQL 1.0 legacy alias
            case t => t
          },
          Option(term.get("datatype")).map(_.asText()).orNull,
          Option(term.get("xml:lang")).map(_.asText()).orNull))
      }
      i += 1
    }
    out.result()
  }

  /** Convert a `?uri ?p ?label` snapshot (from [[labelSnapshotQuery]])
    * into the vocabulary triple shape [[Vocab.lookupTable]] reduces:
    * subject = concept URI, predicate = label predicate, literal object
    * with language. One self-join-free pivot: the three vars of a row
    * are re-assembled by (doc_id, row_id) with conditional aggregation. */
  def labelTriples(results: DataFrame): DataFrame =
    results.groupBy("doc_id", "row_id")
      .agg(
        max(when(col("var") === "uri", col("value"))).as("subject"),
        max(when(col("var") === "p", col("value"))).as("predicate"),
        max(when(col("var") === "label", col("value"))).as("objectValue"),
        max(when(col("var") === "label", col("lang"))).as("lang"),
        max(when(col("var") === "label", col("datatype"))).as("datatype"))
      .filter(col("subject").isNotNull && col("predicate").isNotNull &&
        col("objectValue").isNotNull)
      .select(col("subject"), col("predicate"), col("objectValue"),
        lit(Triple.LITERAL).as("objectKind"), col("datatype"), col("lang"))

  /** End-to-end offline path: saved snapshot response files → lookup
    * table ready to broadcast into [[Vocab.resolve]]. */
  def lookupFromFiles(spark: SparkSession, path: String): DataFrame =
    Vocab.lookupTable(labelTriples(read(spark, path)))
}
