package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental per-group QUANTILE estimates — [[QuantileSketch]]'s
  * deterministic bottom-k-by-portable-hash sample made DURABLE, the
  * third serving-statistics family beside the materialized aggregate
  * ([[IncrementalAgg]]: count/sum/min/max/avg) and the KMV distinct
  * sketch ([[IncrementalDistinct]]): per group the index stores the k
  * rows with the smallest member hash, merged forward under batch
  * arrival at O(batch) — and because bottom-k of a union equals
  * bottom-k of the merged bottom-k's (the sketch's mergeability
  * doctrine), a serve from the index is bit-identical to running the
  * sketch over the full raw history. q159 replays exactly that in SQL
  * (the q135 oracle shape): sample membership, value ranks, and the
  * integer rank arithmetic are all portable.
  *
  * Layout (via [[graft.sources.Bucketed]]: generation-manifest commit,
  * maintenance lock, cross-process CAS): ONE table `<name>_qsk`
  * (g, b, id, v, is_tag) bucketed AND sorted on the group key. Appends
  * land at most k sample rows per group in the batch plus the
  * exactly-once SENTINEL row (the [[IncrementalAgg]] contract — the
  * sentinel commits in the same atomic manifest generation as the
  * batch, so replay skips with no two-table window). [[consolidate]]
  * prunes each group back to its k-row fixpoint. IDs must be UNIQUE
  * across the table's whole history — the [[QuantileSketch]] identity
  * contract (membership is a pure function of id; a duplicated id
  * would hold two sample slots).
  *
  * No retraction (a sample cannot un-see a member and stay a uniform
  * sample of the survivors); [[rebuildGroups]] recomputes touched
  * groups from surviving raw rows at O(touched buckets), the family's
  * healing shape. */
object IncrementalQuantiles {

  private def qskTable(name: String) = s"${name}_qsk"

  private val cols = Seq("g", "b", "id", "v", "is_tag")

  /** The batch's per-group bottom-k sample rows + the sentinel. */
  private def sketchOf(batch: DataFrame, groupCol: String, idCol: String,
                       valueCol: String, k: Int, tag: String): DataFrame = {
    val data = QuantileSketch.bottomKSample(
        batch.select(col(groupCol).as("g"),
          col(idCol).cast("long").as("id"), col(valueCol).as("v")),
        Seq("g"), "id", "v", k)
      .select(col("g"), lit(tag).as("b"), col("id"), col("v"),
        lit(false).as("is_tag"))
    graft.sources.IndexMaintenance.withSentinel(data, tag)
      .select(cols.map(col): _*)
  }

  /** (Re)build the sketch table from `base` as batch `tag`. */
  def buildIndex(base: DataFrame, name: String, buckets: Int,
                 groupCol: String, idCol: String, valueCol: String,
                 k: Int = 64, tag: String = "b0"): Unit =
    graft.sources.Bucketed.save(
      sketchOf(base, groupCol, idCol, valueCol, k, tag),
      qskTable(name), Seq("g"), buckets)

  /** Merge batch `tag`'s samples in — O(batch), exactly-once under
    * replay. Returns false if the tag had already committed. */
  def append(batch: DataFrame, name: String, buckets: Int,
             groupCol: String, idCol: String, valueCol: String, k: Int,
             tag: String): Boolean = {
    val spark = batch.sparkSession
    if (graft.sources.IndexMaintenance.tagApplied(spark, qskTable(name),
        tag)) false
    else {
      graft.sources.Bucketed.save(
        sketchOf(batch, groupCol, idCol, valueCol, k, tag),
        qskTable(name), Seq("g"), buckets, mode = SaveMode.Append)
      true
    }
  }

  /** Prune each oversized bucket's groups back to their bottom-k
    * sample (b = "_"), preserving sentinels — the fixpoint, idempotent
    * under replay. Returns buckets rewritten. */
  def consolidate(spark: SparkSession, name: String, k: Int,
                  maxFilesPerBucket: Int = 4): Int =
    graft.sources.Bucketed.compactBucketsWith(spark, qskTable(name),
      maxFilesPerBucket, rows => {
        val tags = rows.filter(col("is_tag")).dropDuplicates("b")
        val data = QuantileSketch.bottomKSample(
            rows.filter(!col("is_tag")).select("g", "id", "v"),
            Seq("g"), "id", "v", k)
          .select(col("g"), lit("_").as("b"), col("id"), col("v"),
            lit(false).as("is_tag"))
        data.unionByName(tags).select(cols.map(col): _*)
      })

  /** Recompute the named groups' samples from `raw` (the surviving
    * rows) at O(touched buckets) — the healing op for retraction.
    * Sentinels pass through (g null never equi-joins). Returns buckets
    * rewritten. */
  def rebuildGroups(spark: SparkSession, name: String, buckets: Int,
                    raw: DataFrame, groupCol: String, idCol: String,
                    valueCol: String, k: Int, groups: DataFrame): Int = {
    import spark.implicits._
    val g = groups.select(col(groups.columns.head).as("g")).distinct()
      .localCheckpoint(eager = false) // feeds bucket-id collect + joins
    val bIds = g.select(pmod(hash(col("g")), lit(buckets)).cast("int").as("p"))
      .distinct().as[Int].collect().toSet
    val fresh = QuantileSketch.bottomKSample(
        raw.select(col(groupCol).as("g"), col(idCol).cast("long").as("id"),
            col(valueCol).as("v"))
          .join(broadcast(g), Seq("g"), "left_semi"),
        Seq("g"), "id", "v", k)
      .select(col("g"), lit("_").as("b"), col("id"), col("v"),
        lit(false).as("is_tag"))
    graft.sources.Bucketed.rewriteBuckets(spark, qskTable(name), bIds,
      rows => rows.join(broadcast(g), Seq("g"), "left_anti")
        .unionByName(fresh).select(cols.map(col): _*))
  }

  /** Per-group quantile estimates from the stored samples:
    * (g, q_e4, est), [[QuantileSketch.quantileEstimates]]'s contract
    * verbatim (ONE copy of the rank arithmetic — the bottom-k re-rank
    * inside it is the merge, and pruning an already-≤k sample is a
    * no-op, so serving from the index is bit-identical to the one-shot
    * sketch over raw history). O(stored sample rows: ≤ k · groups ·
    * batches-since-consolidation), the corpus never read. `filter`
    * optionally prunes the scan on `g`. */
  def serve(spark: SparkSession, name: String, qs: Seq[Double],
            k: Int = 64, filter: Option[Column] = None): DataFrame = {
    val all = graft.sources.Bucketed.load(spark, qskTable(name))
      .filter(!col("is_tag"))
    QuantileSketch.quantileEstimates(
      filter.fold(all)(all.filter).select("g", "id", "v"),
      Seq("g"), "id", "v", qs, k)
  }
}
