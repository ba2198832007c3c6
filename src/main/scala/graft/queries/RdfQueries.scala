package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.events.Events
import graft.rdf.NS
import graft.sources.Tables

/** RDF-engine queries: the flagship E1 pipeline and PREMIS event
  * emission, each with a DuckDB oracle that reconstructs the expected
  * triple multiset relationally. */
object RdfQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // E1/X3/X4/A7 — flagship CSV→RDF pipeline: triple count per
    // (predicate, objectKind) over the full scan→join→flatten→dedup run
    "q35_flagship_triples" -> ((s, dir) =>
      graft.etl.Flagship.run(s, dir)
        .groupBy("predicate", "objectKind")
        .agg(count(lit(1)).as("n"))
        .orderBy("predicate", "objectKind")),

    // W2/X3 — PREMIS event emission with recovered-id continuation:
    // one fixity event per order, sequential ids after startId, outcome
    // from a data predicate, with the tool (erar:exe), implementer
    // (erar:imp) and prov:startedAtTime the reference's _add records
    "q36_premis_events" -> ((s, dir) => {
      val ids = graft.ids.Identifiers.default
      val batch = Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_totalprice") >= 100000.0).as("ok"))
      Events.emit(batch, Seq(col("o_orderkey")), Events.fix,
          subjectOf = ids.uriCol(col("o_orderkey")),
          outcome = col("ok"), startId = 100L,
          timestamp = "2026-01-01T00:00:00Z",
          tool = lit("https://data.razu.nl/id/tool/droid"),
          startedAt = lit("2025-12-31T23:59:00Z"))
        .groupBy("predicate", "objectKind")
        .agg(count(lit(1)).as("n"),
          min("subject").as("min_subject"), max("subject").as("max_subject"))
        .orderBy("predicate", "objectKind")
    }),

    // S3/K1 end-to-end — the DSv2 "jsonld" source round-trip: flagship
    // triples → format("jsonld") write (one part file per partition,
    // resource-grouped documents) → format("jsonld") read → per-predicate
    // histogram. Triple COUNTS are invariant under the round-trip (bnode
    // labels are file-scoped and remapped on read, but kinds and
    // multiplicities survive), so the q35 oracle applies with the same
    // slice predicate. Runs on a deterministic 1% of orders: the query
    // checks the SOURCE end-to-end, it doesn't re-benchmark the build.
    "q81_jsonld_roundtrip" -> ((s, dir) => {
      // fixed per-user scratch path, reused across invocations (mode
      // "overwrite" truncates the previous .jsonld files): a fresh
      // createTempDirectory per call would leak one dump per bench/
      // verify invocation into /tmp
      val out = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-q81-jsonld-${System.getProperty("user.name", "u")}").toString
      graft.etl.Flagship.run(s, dir, Some(col("o_orderkey") % 100 === 0))
        .write.format("jsonld").mode("overwrite").save(out)
      s.read.format("jsonld").load(out)
        .groupBy("predicate", "objectKind")
        .agg(count(lit(1)).as("n"))
        .orderBy("predicate", "objectKind")
    }))

  // reconstruct the flagship's triple emission per source row: every
  // order (joined to customer+nation) emits a fixed triple shape; all
  // subjects are distinct per order, so dedup never collapses rows
  // and each predicate contributes exactly count(base) triples. Shared
  // by q35 (direct, full table) and q81 (1% slice, after a jsonld
  // write→read round-trip, which preserves the histogram exactly).
  private def flagshipHistogramSql(where: String = ""): String =
    s"""WITH base AS (
         |  SELECT o.o_orderkey FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey $where),
         |n AS (SELECT COUNT(*) AS cnt FROM base)
         |-- record + bestand resources BOTH emit rdf:type (2 per order);
         |-- every other predicate appears once per order; subjects are
         |-- distinct per order so the A7 dedup collapses nothing
         |SELECT predicate, objectKind,
         |       CASE WHEN predicate = '${NS.rdfType}' THEN 2 * cnt
         |            ELSE cnt END AS n
         |FROM n CROSS JOIN (VALUES
         |  ('${NS.rdfType}', 'uri'),
         |  ('${NS.LDTO}naam', 'literal'),
         |  ('${NS.LDTO}omvang', 'literal'),
         |  ('${NS.DCT}creator', 'uri'),
         |  ('${NS.LDTO}classificatie', 'literal'),
         |  ('${NS.LDTO}dekkingInTijd', 'bnode'),
         |  ('${NS.LDTO}begin', 'literal'),
         |  ('${NS.LDTO}dekkingInTijdType', 'uri'),
         |  ('${NS.LDTO}heeftRepresentatie', 'uri'),
         |  ('${NS.LDTO}URLBestand', 'literal'),
         |  ('${NS.LDTO}isRepresentatieVan', 'uri')
       |) AS t(predicate, objectKind)
       |ORDER BY predicate, objectKind""".stripMargin

  val oracles: Map[String, String] = Map(
    "q35_flagship_triples" -> flagshipHistogramSql(),
    "q81_jsonld_roundtrip" ->
      flagshipHistogramSql("WHERE o.o_orderkey % 100 = 0"),

    "q36_premis_events" -> {
      val prefix = "https://data.razu.nl/id/event/NL-WbDRAZU-G0321-661-e"
      s"""WITH base AS (
         |  SELECT o_orderkey, o_totalprice >= 100000.0 AS ok,
         |         100 + row_number() OVER (ORDER BY o_orderkey) AS eid
         |  FROM orders),
         |subj AS (SELECT '$prefix' || CAST(eid AS VARCHAR) AS s, ok FROM base),
         |triples AS (
         |  SELECT s, '${NS.rdfType}' AS predicate, 'uri' AS objectKind FROM subj
         |  UNION ALL SELECT s, '${NS.PREMIS}eventType', 'uri' FROM subj
         |  UNION ALL SELECT s, '${NS.EROR}sou', 'uri' FROM subj
         |  UNION ALL SELECT s, '${NS.ERAR}imp', 'uri' FROM subj
         |  UNION ALL SELECT s, '${NS.ERAR}exe', 'uri' FROM subj
         |  UNION ALL SELECT s, '${NS.PROV}startedAtTime', 'literal' FROM subj
         |  UNION ALL SELECT s, '${NS.PROV}endedAtTime', 'literal' FROM subj
         |  UNION ALL SELECT s, '${NS.PREMIS}outcome', 'uri' FROM subj)
         |SELECT predicate, objectKind, COUNT(*) AS n,
         |       MIN(s) AS min_subject, MAX(s) AS max_subject
         |FROM triples GROUP BY predicate, objectKind
         |ORDER BY predicate, objectKind""".stripMargin
    })
}
