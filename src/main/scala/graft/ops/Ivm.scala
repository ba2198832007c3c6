package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.{Bucketed, Replication}

/** INCREMENTAL VIEW MAINTENANCE — a materialized aggregate that
  * FOLLOWS a governed bucketed table: each [[refresh]] reads the
  * source's generation delta since the view's bookmark
  * ([[Bucketed.diffGenerations]] — O(changed files), never O(table)),
  * applies inserts as [[IncrementalAgg.append]] partials and deletes
  * as [[IncrementalAgg.retract]] partials, and advances the durable
  * bookmark. The classic delta-maintained view, composed entirely
  * from pieces that already carry the crash contracts:
  *
  *  - the source's merges/appends/deletes commit atomic generations,
  *    so the delta between two bookmarked generations is exact
  *    row-level change (an updated key arrives as delete + insert —
  *    count/sum retract the old row and add the new one);
  *  - the append/retract pair is EXACTLY-ONCE under replay via the
  *    generation-derived idempotency tag (`ivm-<from>-<to>-i/-d`):
  *    a refresh retried after ANY crash re-runs both halves, and each
  *    half's sentinel says whether it already landed — a crash
  *    BETWEEN the two halves heals on retry, no two-phase commit;
  *  - the bookmark advances LAST, so a stale bookmark can only cause
  *    a replayed (and skipped) refresh, never a missed delta.
  *
  * Serving inherits [[IncrementalAgg.serve]]'s contract: count / sum /
  * avg are exact immediately; groups with outstanding retractions
  * serve null min/max until [[IncrementalAgg.repairGroups]]. The
  * source must retain generations back to the bookmark
  * ([[Bucketed.setRetention]]) — behind the window the refresh fails
  * loudly (rebuild the view) rather than applying a partial delta. */
object Ivm {

  /** Build the view over `source`'s current head and bookmark that
    * generation. `groupCol`/`valueCol` name the source columns
    * (value pre-quantized long — the house sum doctrine). */
  def create(spark: SparkSession, source: String, view: String,
             buckets: Int, groupCol: String, valueCol: String): Long = {
    val gen = Bucketed.currentGeneration(spark, source)
    IncrementalAgg.buildIndex(
      Bucketed.loadAsOf(spark, source, gen).select(
        col(groupCol), col(valueCol)),
      view, buckets, groupCol, valueCol)
    Replication.writeBookmark(spark, s"${view}_partials", gen)
    gen
  }

  /** Bring the view up to `source`'s head, one CONSECUTIVE generation
    * pair at a time — each pair's delta applied as one append + one
    * retract (each exactly-once under its `ivm-<a>-<b>` tag), the
    * bookmark advancing after each pair. Consecutive pairs, not one
    * net diff, is what makes retry safe: a (from, head) span RESHAPES
    * if the source commits between a crash and the retry, and the
    * reshaped span's fresh tag would re-apply the crashed span's
    * already-landed partials — per-pair spans are immutable, so a
    * replayed pair finds its sentinels and skips exactly. No-op when
    * caught up. Returns the new bookmark. */
  def refresh(spark: SparkSession, source: String, view: String,
              buckets: Int, groupCol: String, valueCol: String): Long = {
    val partials = s"${view}_partials"
    val from = Replication.bookmark(spark, partials).getOrElse(
      throw new IllegalStateException(
        s"$view has no bookmark — create it from $source first"))
    val head = Bucketed.currentGeneration(spark, source)
    if (head == from) return from
    require(head > from,
      s"$view's bookmark $from is ahead of $source's head $head — " +
        "the source was rebuilt; recreate the view")
    val retained = Bucketed.generations(spark, source)
    if (!retained.contains(from))
      throw new IllegalStateException(
        s"$source no longer retains generation $from — the view's " +
          "bookmark fell behind the retention window; recreate it")
    retained.dropWhile(_ < from).takeWhile(_ <= head)
      .sliding(2).foreach {
        case Seq(a, b) =>
          val diff = Bucketed.diffGenerations(spark, source, a, b)
            .localCheckpoint(eager = false) // one eval feeds both halves
          IncrementalAgg.append(
            diff.filter(col("change") === "insert")
              .select(col(groupCol), col(valueCol)),
            view, buckets, groupCol, valueCol, s"ivm-$a-$b-i")
          IncrementalAgg.retract(
            diff.filter(col("change") === "delete")
              .select(col(groupCol), col(valueCol)),
            view, buckets, groupCol, valueCol, s"ivm-$a-$b-d")
          Replication.writeBookmark(spark, partials, b)
        case _ => ()
      }
    head
  }

  /** The view's current rollup — [[IncrementalAgg.serve]]. */
  def serve(spark: SparkSession, view: String): DataFrame =
    IncrementalAgg.serve(spark, view)

  /** Restore exact min/max for every group the deltas retracted: the
    * retracted groups are read from the view's own partials
    * (`retr > 0` — no side ledger), and their partials are recomputed
    * from the source's CURRENT rows via
    * [[IncrementalAgg.repairGroups]] (one source scan semi-joined to
    * the bounded group set + a rewrite of those groups' buckets).
    * Requires the view to be CAUGHT UP (bookmark == source head) —
    * repairing against a head the view hasn't applied would fold
    * unapplied deltas into the repaired groups ahead of their
    * exactly-once application. Returns buckets rewritten. */
  def repair(spark: SparkSession, source: String, view: String,
             buckets: Int, groupCol: String, valueCol: String): Int = {
    val partials = s"${view}_partials"
    val from = Replication.bookmark(spark, partials).getOrElse(
      throw new IllegalStateException(s"$view has no bookmark"))
    val head = Bucketed.currentGeneration(spark, source)
    require(from == head,
      s"$view is at generation $from but $source is at $head — " +
        "refresh before repairing")
    val retracted = Bucketed.load(spark, partials)
      .filter(!org.apache.spark.sql.functions.col("is_tag"))
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("retr").as("r"))
      .filter(org.apache.spark.sql.functions.col("r") > 0)
      .select("g")
    IncrementalAgg.repairGroups(spark, view, buckets,
      Bucketed.load(spark, source).select(col(groupCol), col(valueCol)),
      groupCol, valueCol, retracted)
  }
}
