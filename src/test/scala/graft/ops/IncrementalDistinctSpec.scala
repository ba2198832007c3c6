package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Incremental KMV distinct index: serve() must equal
  * Profile.kmvDistinct over the raw rows (the merge is lossless for
  * the k-min statistic) through build/append/consolidate, appends are
  * exactly-once under replay, and rebuildGroups heals retracted
  * groups from surviving raw rows. */
class IncrementalDistinctSpec extends SparkSuite {
  import spark.implicits._

  private val name = "graft_incdist_idx"
  private val buckets = 4
  private val k = 8

  // (g, v): 5 groups, ~40 distinct values per group — well past k=8,
  // so the (k-1)*P div h_k estimate path is exercised
  private def rows(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong % 5, (i * 7 % 201).toLong))
      .toDF("g", "v")

  private def served(): Set[(Long, Long)] =
    IncrementalDistinct.serve(spark, name, k)
      .as[(Long, Long)].collect().toSet

  private def oracle(raw: DataFrame): Set[(Long, Long)] =
    Profile.kmvDistinct(raw, Seq("g"), "v", k)
      .as[(Long, Long)].collect().toSet

  private def drop(): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${name}_kmv")

  test("serve equals the one-shot KMV over raw through build/append/consolidate") {
    try {
      IncrementalDistinct.buildIndex(rows(0, 70), name, buckets, "g", "v", k)
      assert(served() == oracle(rows(0, 70)) && served().nonEmpty)
      assert(IncrementalDistinct.append(rows(70, 140), name, buckets,
        "g", "v", k, "b1"))
      assert(served() == oracle(rows(0, 140)))
      assert(IncrementalDistinct.append(rows(140, 200), name, buckets,
        "g", "v", k, "b2"))
      val full = oracle(rows(0, 200))
      assert(served() == full)
      // consolidation prunes to the fixpoint; estimates unchanged
      IncrementalDistinct.consolidate(spark, name, k, maxFilesPerBucket = 1)
      assert(served() == full)
      IncrementalDistinct.consolidate(spark, name, k, maxFilesPerBucket = 1)
      assert(served() == full)
      // stored rows per group are pruned back to <= k
      val maxPerGroup = graft.sources.Bucketed.load(spark, s"${name}_kmv")
        .filter(!col("is_tag")).groupBy("g").count()
        .agg(max("count")).as[Long].head()
      assert(maxPerGroup <= k)
    } finally drop()
  }

  test("appends are exactly-once under replay, including after consolidation") {
    try {
      IncrementalDistinct.buildIndex(rows(0, 50), name, buckets, "g", "v", k)
      assert(IncrementalDistinct.append(rows(50, 100), name, buckets,
        "g", "v", k, "b1"))
      val once = served()
      assert(!IncrementalDistinct.append(rows(50, 100), name, buckets,
        "g", "v", k, "b1"))
      assert(served() == once)
      IncrementalDistinct.consolidate(spark, name, k, maxFilesPerBucket = 1)
      assert(!IncrementalDistinct.append(rows(50, 100), name, buckets,
        "g", "v", k, "b1"))
      assert(served() == once)
    } finally drop()
  }

  test("rebuildGroups recomputes touched groups from surviving raw rows") {
    try {
      IncrementalDistinct.buildIndex(rows(0, 200), name, buckets, "g", "v", k)
      // "retract" group 2's rows with v >= 100: KMV cannot un-see, so
      // the heal recomputes those groups from the survivors
      val gonePred = col("g") === 2 && col("v") >= 100
      val remaining = rows(0, 200).filter(!gonePred)
      val n = IncrementalDistinct.rebuildGroups(spark, name, buckets,
        remaining, "g", "v", k,
        rows(0, 200).filter(gonePred).select("g"))
      assert(n > 0)
      assert(served() == oracle(remaining))
    } finally drop()
  }
}
