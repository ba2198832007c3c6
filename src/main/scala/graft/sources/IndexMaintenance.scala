package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE implementation of the content-derived delete/compact plumbing
  * all four incremental index families share
  * ([[graft.text.IncrementalDedup]] band index,
  * [[graft.sim.IncrementalAnn]] full-vector inverted lists,
  * [[graft.sim.IncrementalPq]] code postings,
  * [[graft.text.IncrementalBm25]] term postings). Each family's
  * deleteFromIndex recomputes the deleted rows' POSTING KEYS from
  * content (bands / nearest centroid / coarse assignment / tokens) so
  * the affected buckets are known WITHOUT scanning the index, then
  * rewrites only those buckets anti-joining the ids out — the
  * O(touched buckets), never O(index), deletion doctrine. The four
  * families previously repeated the bucket-id collect + rewrite +
  * dropDuplicates shape verbatim; one copy means an invariant fixed
  * here (e.g. the dropDuplicates that heals append-replay rows during
  * the rewrite) is fixed for every family at once.
  *
  * The anti-join transform is idempotent and duplicate-tolerant — the
  * [[Bucketed.rewriteBuckets]] replay contract — and `dropDuplicates`
  * on the survivors also heals at-least-once append-replay duplicates
  * in the touched buckets for free. */
object IndexMaintenance {

  /** Rewrite exactly the buckets of `del`'s `bucketKeyCol` values
    * (`pmod(hash(key), buckets)` — Spark's own bucket function),
    * anti-joining `del`'s `idCol` values out of the table. `del` is
    * the content-derived posting projection of the deletion batch:
    * at minimum (bucketKeyCol, idCol), already deduplicated if the
    * caller's semantics need it. Returns buckets rewritten. */
  def deletePostings(del: DataFrame, table: String, buckets: Int,
                     bucketKeyCol: String, idCol: String): Int = {
    val spark = del.sparkSession
    import spark.implicits._
    val d = del.select(col(bucketKeyCol), col(idCol))
      .localCheckpoint(eager = false) // feeds bucket-id collect + join
    val bIds = d
      .select(pmod(hash(col(bucketKeyCol)), lit(buckets)).cast("int").as("b"))
      .distinct().as[Int].collect().toSet
    val ids = d.select(idCol).distinct()
    Bucketed.rewriteBuckets(spark, table, bIds,
      idx => idx.join(broadcast(ids), Seq(idCol), "left_anti")
        .dropDuplicates())
  }

  /** Periodic compaction of a posting-set table — delegates to
    * [[Bucketed.compactBuckets]] with dedup ON (every family's
    * postings are SETS; dedup-on-rewrite heals append-replay
    * duplicates). Families with side state to re-stamp (the BM25
    * stats generation binding) wrap this. */
  def compactPostings(spark: SparkSession, table: String,
                      maxFilesPerBucket: Int = 4): Int =
    Bucketed.compactBuckets(spark, table, maxFilesPerBucket)
}
