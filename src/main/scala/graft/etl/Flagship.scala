package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.DateTypes
import graft.ids.Identifiers
import graft.rdf.{Build, NS, Triple}
import graft.rdf.Build._

/** E1 — the flagship CSV→RDF pipeline shape (csv2rdf.py:54-261)
  * re-expressed over the driver testdata star schema:
  *
  *   scan (S1/S2) → null-fill cast (M2) → broadcast vocabulary join (J1)
  *   → equi-join (J2) → nested resource-struct build (M1) → triple
  *   flattening with skolem bnodes (X3/X4) → graph dedup (A7).
  *
  * Zero UDFs; the only shuffle is the final dropDuplicates (the vocab and
  * dimension joins broadcast). At 100 TB the orders scan partitions
  * freely; triple emission is map-side; the dedup shuffle hashes on the
  * full triple — the one shuffle the semantics genuinely require.
  */
object Flagship {

  /** @param ordersWhere optional pushdown predicate on the orders scan —
    *   lets callers run the identical pipeline shape over a bounded,
    *   deterministic slice (e.g. the q81 jsonld round-trip exercises the
    *   source on 1% of orders rather than re-running the full build). */
  def run(spark: SparkSession, dir: String,
          ordersWhere: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val ids = Identifiers.default
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

    // J1 — vocabulary snapshot broadcast join (concept_resolver.py:65-114):
    // nation name -> concept URI, the offline stand-in for the SPARQL
    // endpoint lookup.
    val vocab = broadcast(t("nation")
      .select(col("n_nationkey"),
        concat(lit("https://data.razu.nl/id/actor/"),
          lower(col("n_name"))).as("actor_uri")))

    // J2 — keyed equi-join to the dimension table (csv2rdf.py:207-208).
    val customer = t("customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .join(vocab, col("c_nationkey") === col("n_nationkey"))

    // widen the single-file scan before the 12x triple fan-out — at bench
    // scale the parquet file has 1-2 row groups, which would run the whole
    // explode stage on 1-2 cores (graft.sources.Tables.widen scale note)
    val orders = graft.sources.Tables
      .widen(ordersWhere.foldLeft(t("orders"))(_ filter _))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      // M2 — null-fill + cast (csv2rdf.py:56)
      .withColumn("omvang", coalesce(col("o_totalprice"), lit(0.0)).cast("long"))
      .withColumn("datering", date_format(col("o_orderdate"), "yyyy-MM-dd"))

    // M1 — resource construction: one Informatieobject per order row with
    // a nested dekkingInTijd bnode (csv2rdf.py:117-200), plus the linked
    // bestand resource (csv2rdf.py:210-227).
    val subj = ids.uriCol(col("o_orderkey"))
    val bestandSubj = ids.uriCol(concat(col("o_orderkey").cast("string"), lit("b")))
    val record = RResource(subj, Seq(
      NS.rdfType -> RUri(lit(NS.LDTO + "Informatieobject")),
      (NS.LDTO + "naam") -> RLit(col("o_orderpriority")),
      (NS.LDTO + "omvang") -> RLit(col("omvang"), datatype = lit(NS.xsdInteger)),
      (NS.DCT + "creator") -> RUri(col("actor_uri")),
      (NS.LDTO + "classificatie") -> RSplit(col("o_orderstatus"), ";"),
      (NS.LDTO + "dekkingInTijd") -> RNode(Seq(
        (NS.LDTO + "begin") -> RLit(DateTypes.dateValueCol(col("datering")),
          datatype = DateTypes.dateDatatypeCol(col("datering"))),
        (NS.LDTO + "dekkingInTijdType") -> RUri(
          lit("https://data.razu.nl/id/dekkingintijdtype/creation"))),
        cond = col("datering").isNotNull),
      (NS.LDTO + "heeftRepresentatie") -> RUri(bestandSubj)))
    val bestand = RResource(bestandSubj, Seq(
      NS.rdfType -> RUri(lit(NS.LDTO + "Bestand")),
      (NS.LDTO + "URLBestand") -> RLit(
        ids.cdnUriCol(ids.uidCol(col("o_orderkey")), lit("jpg")),
        datatype = lit(NS.xsdAnyURI)),
      (NS.LDTO + "isRepresentatieVan") -> RUri(subj)))

    // X3/X4 flatten + A7 graph dedup
    Build.dedup(Build.flattenAll(orders, Seq(record, bestand)))
  }

  /** Triple-count-per-predicate summary of the flagship graph — the
    * registered query form (SQL-oracle-able shape for sanity checks). */
  def predicateHistogram(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir).groupBy("predicate", "objectKind")
      .agg(count(lit(1)).as("n"))
      .orderBy("predicate", "objectKind")
}
