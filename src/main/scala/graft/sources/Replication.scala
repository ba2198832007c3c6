package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** RESUMABLE incremental table replication on the bucketed contract —
  * the deployment loop around [[Bucketed.diffGenerations]] +
  * [[Bucketed.applyChanges]]: a replica that can be brought up to the
  * source's head at any time, across process restarts, shipping only
  * the O(changed files) delta since the last sync instead of the
  * table.
  *
  * The replica carries a durable BOOKMARK (`_graft_sync`, a small
  * marker file beside its manifests, same shape as the retention
  * marker): the last source generation it has fully applied. Each
  * [[sync]] reads the bookmark, computes ONE net diff
  * bookmark → head (a multi-commit delta reads only the files the two
  * end manifests disagree on — intermediate generations are never
  * touched), applies it as one atomic merge generation on the
  * replica, and then advances the bookmark. Crash anywhere in that
  * sequence is safe WITHOUT a two-phase commit: a crash before the
  * replica's merge commits leaves both bookmark and replica at the
  * old state; a crash between the merge and the bookmark write leaves
  * the bookmark stale, and the retried sync re-applies the same diff
  * — idempotent by [[Bucketed.mergeByKey]]'s delete-then-insert
  * contract. Exactly-once EFFECT from at-least-once application.
  *
  * The source must RETAIN generations back to the bookmark
  * ([[Bucketed.setRetention]]): a bookmark that has fallen behind the
  * retained window fails loudly (re-bootstrap with [[bootstrap]])
  * rather than silently shipping a partial delta. The replica's
  * bucket key must identify rows uniquely — [[Bucketed.applyChanges]]'
  * row-level-CDC contract. */
object Replication {

  private val SyncName = "_graft_sync"
  private val SyncMagic = "graft-sync-v1"

  /** Create `replica` as a copy of `source`'s current head snapshot
    * (explicit manifest-resolved file list — stable under concurrent
    * commits when the source retains history) and bookmark that
    * generation. Returns the bookmarked source generation. */
  def bootstrap(spark: SparkSession, source: String, replica: String,
                buckets: Int): Long = {
    val gen = Bucketed.currentGeneration(spark, source)
    val keys = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(source))
      .bucketSpec.map(_.bucketColumnNames).getOrElse(
        throw new IllegalArgumentException(s"$source is not bucketed"))
    Bucketed.save(Bucketed.loadAsOf(spark, source, gen), replica,
      keys, buckets)
    writeBookmark(spark, replica, gen)
    gen
  }

  /** The replica's last fully-applied source generation, if it was
    * ever bootstrapped/synced (a torn marker reads as absent — the
    * caller must re-bootstrap, never silently re-sync from 0). */
  def bookmark(spark: SparkSession, replica: String): Option[Long] = {
    val dir = locationOf(spark, replica)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(dir, SyncName)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val bytes =
          try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          finally in.close()
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq match {
          case SyncMagic +: g +: _ => g.trim.toLongOption
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Bring `replica` up to `source`'s current head: one net diff from
    * the bookmark, one atomic merge, then the bookmark advances.
    * Returns the new bookmark (= the source head at sync start); a
    * no-op when already caught up. Retrying after ANY crash is safe —
    * re-applying an already-applied diff changes nothing. */
  def sync(spark: SparkSession, source: String, replica: String): Long = {
    val from = bookmark(spark, replica).getOrElse(
      throw new IllegalStateException(
        s"$replica has no sync bookmark — bootstrap it from $source first"))
    val head = Bucketed.currentGeneration(spark, source)
    if (head == from) return from
    require(head > from,
      s"$replica's bookmark $from is ahead of $source's head $head — " +
        "the source was rebuilt; re-bootstrap the replica")
    val retained = Bucketed.generations(spark, source)
    if (!retained.contains(from))
      throw new IllegalStateException(
        s"$source no longer retains generation $from (oldest retained: " +
          s"${retained.headOption.getOrElse(-1L)}) — the bookmark fell " +
          "behind the retention window; re-bootstrap the replica")
    Bucketed.applyChanges(spark, replica,
      Bucketed.diffGenerations(spark, source, from, head))
    writeBookmark(spark, replica, head)
    head
  }

  /** Stamp `replica`'s sync bookmark (also used by derived-table
    * followers, e.g. [[graft.ops.Ivm]]'s materialized views — any
    * table that tracks a source generation can carry one). */
  private[graft] def writeBookmark(spark: SparkSession, replica: String,
                                   gen: Long): Unit = {
    val dir = locationOf(spark, replica)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, SyncName), true)
    try out.write(s"$SyncMagic\n$gen\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def locationOf(spark: SparkSession, table: String): Path =
    new Path(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
}
