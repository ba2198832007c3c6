package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental per-group approximate COUNT DISTINCT — the mergeable
  * KMV (k-minimum-values) sketch of [[Profile.kmvDistinct]] made
  * DURABLE: per group, the index stores the k smallest distinct
  * portable hashes of the values seen so far, maintained under batch
  * arrival at O(batch) — at 100 TB "distinct users per key, refreshed
  * hourly" must not re-scan history, and KMV is the sketch whose merge
  * is LOSSLESS for the statistic served (the k smallest of a union are
  * always contained in the union of each side's k smallest), so a
  * serve from the index is bit-identical to running the sketch over
  * the full raw data — q156 replays exactly that as portable SQL, the
  * q119 doctrine (HLL words are engine-internal; the KMV order
  * statistic is plain integer arithmetic both engines reproduce).
  *
  * Layout (via [[graft.sources.Bucketed]]: generation-manifest commit,
  * maintenance lock, cross-process CAS): ONE table `<name>_kmv`
  * (g, b, h, is_tag) bucketed AND sorted on the group key `g`. Each
  * append lands at most k hash rows per group in the batch plus the
  * exactly-once SENTINEL row (same tag-in-same-commit contract as
  * [[IncrementalAgg]] — sketch rows cannot be content-deduplicated
  * against replay because two batches may legitimately contribute the
  * same (g, h)). Rows per group grow O(k · batches) between
  * consolidations; [[consolidate]] prunes each group back to its k
  * smallest distinct hashes (the sketch's fixpoint — idempotent, the
  * replay contract). A replayed batch's duplicate (g, h) rows would
  * not even skew the estimate (the serve path distincts), but the
  * sentinel skips them anyway — exactly-once keeps the row-growth
  * bound honest.
  *
  * No retraction: KMV (like HLL) is not retractable — deleting a value
  * cannot un-see its hash. The healing op for uncertain state is
  * [[rebuildGroups]]: recompute the touched groups' sketches from the
  * surviving raw rows at O(touched buckets), the
  * [[IncrementalAgg.repairGroups]] shape. */
object IncrementalDistinct {

  private def kmvTable(name: String) = s"${name}_kmv"

  private val cols = Seq("g", "b", "h", "is_tag")

  /** Per-group k smallest distinct portable hashes of `batch` plus the
    * exactly-once sentinel — one window shuffle over the batch only.
    * Hash = squareMix(polyHash(value as string)), the engine's
    * portable pair (both replayable in ANSI SQL). */
  private def sketchOf(batch: DataFrame, groupCol: String,
                       valueCol: String, k: Int, tag: String): DataFrame = {
    val ph = graft.functions.Hashing.polyHashCol(
      col(valueCol).cast("string"))
    val hashed = batch.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        graft.functions.Hashing.squareMixCol(ph).as("h"))
      .distinct()
    val w = Window.partitionBy("g").orderBy(col("h").asc)
    val data = hashed.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("g"), lit(tag).as("b"), col("h"),
        lit(false).as("is_tag"))
    graft.sources.IndexMaintenance.withSentinel(data, tag)
      .select(cols.map(col): _*)
  }

  /** (Re)build the sketch table from `base` as batch `tag`. */
  def buildIndex(base: DataFrame, name: String, buckets: Int,
                 groupCol: String, valueCol: String, k: Int = 256,
                 tag: String = "b0"): Unit =
    graft.sources.Bucketed.save(
      sketchOf(base, groupCol, valueCol, k, tag),
      kmvTable(name), Seq("g"), buckets)

  /** Merge batch `tag`'s per-group sketches in — O(batch),
    * exactly-once under replay. Returns false if the tag had already
    * committed. */
  def append(batch: DataFrame, name: String, buckets: Int,
             groupCol: String, valueCol: String, k: Int,
             tag: String): Boolean = {
    val spark = batch.sparkSession
    if (graft.sources.IndexMaintenance.tagApplied(spark, kmvTable(name),
        tag)) false
    else {
      graft.sources.Bucketed.save(
        sketchOf(batch, groupCol, valueCol, k, tag),
        kmvTable(name), Seq("g"), buckets, mode = SaveMode.Append)
      true
    }
  }

  /** Prune each oversized bucket's groups back to their k smallest
    * distinct hashes (b = "_"), preserving sentinels — the sketch's
    * fixpoint, so consolidating twice is a no-op. Returns buckets
    * rewritten. */
  def consolidate(spark: SparkSession, name: String, k: Int,
                  maxFilesPerBucket: Int = 4): Int =
    graft.sources.Bucketed.compactBucketsWith(spark, kmvTable(name),
      maxFilesPerBucket, rows => {
        val tags = rows.filter(col("is_tag")).dropDuplicates("b")
        val w = Window.partitionBy("g").orderBy(col("h").asc)
        val data = rows.filter(!col("is_tag"))
          .select("g", "h").distinct()
          .withColumn("__r", row_number().over(w))
          .filter(col("__r") <= k)
          .select(col("g"), lit("_").as("b"), col("h"),
            lit(false).as("is_tag"))
        data.unionByName(tags).select(cols.map(col): _*)
      })

  /** Recompute the named groups' sketches from `raw` (the surviving
    * rows) at O(touched buckets) — the healing op for retraction or
    * uncertain history (KMV itself is not retractable). Sentinels pass
    * through (g null never equi-joins). Returns buckets rewritten. */
  def rebuildGroups(spark: SparkSession, name: String, buckets: Int,
                    raw: DataFrame, groupCol: String, valueCol: String,
                    k: Int, groups: DataFrame): Int = {
    import spark.implicits._
    val g = groups.select(col(groups.columns.head).as("g")).distinct()
      .localCheckpoint(eager = false) // feeds bucket-id collect + joins
    val bIds = g.select(pmod(hash(col("g")), lit(buckets)).cast("int").as("p"))
      .distinct().as[Int].collect().toSet
    val ph = graft.functions.Hashing.polyHashCol(
      col(valueCol).cast("string"))
    val w = Window.partitionBy("g").orderBy(col("h").asc)
    val fresh = raw.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("g"),
        graft.functions.Hashing.squareMixCol(ph).as("h"))
      .join(broadcast(g), Seq("g"), "left_semi")
      .distinct()
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("g"), lit("_").as("b"), col("h"),
        lit(false).as("is_tag"))
    graft.sources.Bucketed.rewriteBuckets(spark, kmvTable(name), bIds,
      rows => rows.join(broadcast(g), Seq("g"), "left_anti")
        .unionByName(fresh).select(cols.map(col): _*))
  }

  /** The served estimate: (g, kmv_distinct) — per group, the exact
    * distinct-hash count when fewer than k hashes survive, else
    * (k−1)·P div h_k, INTEGER division ([[Profile.kmvDistinct]]'s
    * formula verbatim — one arithmetic, two call sites, and the q156
    * oracle replays it). O(stored sketch rows), the corpus never read.
    * `filter` optionally prunes the scan on `g` (PushedFilters +
    * sorted-on-g row-group skip). */
  def serve(spark: SparkSession, name: String, k: Int,
            filter: Option[Column] = None): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val P = graft.functions.Hashing.P
    val num = (k - 1).toLong * P
    val all = graft.sources.Bucketed.load(spark, kmvTable(name))
      .filter(!col("is_tag"))
    val w = Window.partitionBy("g").orderBy(col("h").asc)
    filter.fold(all)(all.filter)
      .select("g", "h").distinct()
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy("g")
      .agg(count(lit(1)).as("__n"),
        max(when(col("__r") === k, col("h"))).as("__kth"))
      .select(col("g"),
        when(col("__kth").isNull, col("__n"))
          .otherwise(expr(s"${num}L div __kth"))
          .as("kmv_distinct"))
  }
}
