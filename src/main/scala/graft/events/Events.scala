package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ids.Identifiers
import graft.ops.Relational
import graft.rdf.{Build, NS}
import graft.rdf.Build._

/** PREMIS preservation-event module — razu/preservation_events.py as
  * DataFrame programs.
  *
  * The reference appends events one at a time to an in-memory graph with
  * a process-global counter and a deferred-evaluation queue
  * (preservation_events.py:44-59). Here an event *batch* is derived from
  * a pipeline output DF in one shot: sequential ids are a row_number over
  * an explicit order starting after the recovered max id (A2/W2), the
  * queue disappears (DataFrame laziness is the deferral), and the event
  * triples come from the X3 flattener.
  */
object Events {

  /** PREMIS event-type IRIs used by the reference
    * (preservation_events.py:105-182). */
  val EventType = "http://id.loc.gov/vocabulary/preservation/eventType/"
  val fil: String = EventType + "fil"
  val fix: String = EventType + "fix"
  val ine: String = EventType + "ine"
  val mmd: String = EventType + "mmd"
  val vir: String = EventType + "vir"

  def outcomeUri(success: Boolean): String =
    NS.EO + (if (success) "suc" else "fail")

  /** A2 — recover the max numeric event id from an existing event graph
    * (preservation_events.py:34-38): parse the trailing `-e<N>` of every
    * subject. 0 on an empty graph. */
  def maxEventId(eventGraph: DataFrame): Long = {
    val r = eventGraph
      .agg(max(regexp_extract(col("subject"), "-e(\\d+)$", 1).cast("long")))
      .head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** F10 — lock predicate: the graph is locked once an ingestion-end
    * (`ine`) event exists (preservation_events.py:40-42). Driver-side
    * boolean gating the write job, like the reference's decorator. */
  def isLocked(eventGraph: DataFrame): Boolean =
    eventGraph.filter(
      col("predicate") === (NS.PREMIS + "eventType")
        && col("objectValue") === ine)
      .limit(1).count() > 0

  /** Emit one event per row of `batch` as PREMIS triples.
    *
    * @param batch     one row per event
    * @param order     explicit total order for sequential event ids (W2)
    * @param eventType PREMIS event type IRI
    * @param subjectOf column with the object URI the event is about
    * @param outcome   boolean column → premis:outcome suc/fail
    * @param note      optional outcome note column
    * @param startId   ids start at startId+1 (recovered via maxEventId)
    * @param timestamp ISO dateTime for prov:endedAtTime (driver-stamped
    *                  once per batch, like the reference's per-run clock)
    */
  def emit(batch: DataFrame, order: Seq[Column], eventType: String,
           subjectOf: Column, outcome: Column, note: Column = lit(null),
           startId: Long = 0L,
           timestamp: String = java.time.Instant.now().toString,
           ids: Identifiers = Identifiers.default): DataFrame = {
    val withId = Relational.sequentialIds(batch, order, "__eid", startId)
    val eventUri = concat(lit(ids.eventUriPrefix + "-e"), col("__eid"))
    val shape = RResource(eventUri, Seq(
      NS.rdfType -> RUri(lit(NS.PREMIS + "Event")),
      (NS.PREMIS + "eventType") -> RUri(lit(eventType)),
      (NS.EROR + "sou") -> RUri(subjectOf),
      (NS.PROV + "endedAtTime") -> RLit(lit(timestamp),
        datatype = lit(NS.xsdDateTime)),
      (NS.PREMIS + "outcome") -> RUri(
        when(outcome, lit(outcomeUri(true))).otherwise(lit(outcomeUri(false)))),
      (NS.PREMIS + "outcomeNote") -> RLit(note)))
    Build.flatten(withId, shape)
  }

  /** K4 — eventlog save: the event graph serializes through the JSON-LD
    * writer like any resource graph. */
  def save(eventGraph: DataFrame, outDir: String): Unit =
    graft.rdf.io.JsonLd.documents(eventGraph)
      .write.mode("overwrite").json(outDir)
}
