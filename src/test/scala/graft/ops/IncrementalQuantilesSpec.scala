package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Incremental quantile sketch: serve() must equal the one-shot
  * QuantileSketch over the raw history (bottom-k merge is lossless)
  * through build/append/consolidate, appends are exactly-once under
  * replay, and rebuildGroups heals retracted groups. */
class IncrementalQuantilesSpec extends SparkSuite {
  import spark.implicits._

  private val name = "graft_incq_idx"
  private val buckets = 4
  private val k = 16
  private val qs = Seq(0.25, 0.5, 0.9)

  // (g, id, v): 4 groups, unique ids, spread values
  private def rows(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong % 4, i.toLong, (i * 17 % 997).toLong))
      .toDF("g", "id", "v")

  private def served(): Set[(Long, Long, Long)] =
    IncrementalQuantiles.serve(spark, name, qs, k)
      .as[(Long, Long, Long)].collect().toSet

  private def oracle(raw: DataFrame): Set[(Long, Long, Long)] =
    QuantileSketch.quantileEstimates(raw, Seq("g"), "id", "v", qs, k)
      .as[(Long, Long, Long)].collect().toSet

  private def drop(): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${name}_qsk")

  test("serve equals the one-shot sketch over raw through build/append/consolidate") {
    try {
      IncrementalQuantiles.buildIndex(rows(0, 60), name, buckets,
        "g", "id", "v", k)
      assert(served() == oracle(rows(0, 60)) && served().nonEmpty)
      assert(IncrementalQuantiles.append(rows(60, 130), name, buckets,
        "g", "id", "v", k, "b1"))
      assert(served() == oracle(rows(0, 130)))
      assert(IncrementalQuantiles.append(rows(130, 200), name, buckets,
        "g", "id", "v", k, "b2"))
      val full = oracle(rows(0, 200))
      assert(served() == full)
      IncrementalQuantiles.consolidate(spark, name, k, maxFilesPerBucket = 1)
      assert(served() == full)
      // fixpoint: each group stores <= k sample rows after consolidate
      val maxPerGroup = graft.sources.Bucketed.load(spark, s"${name}_qsk")
        .filter(!col("is_tag")).groupBy("g").count()
        .agg(max("count")).as[Long].head()
      assert(maxPerGroup <= k)
    } finally drop()
  }

  test("appends are exactly-once under replay, including after consolidation") {
    try {
      IncrementalQuantiles.buildIndex(rows(0, 50), name, buckets,
        "g", "id", "v", k)
      assert(IncrementalQuantiles.append(rows(50, 100), name, buckets,
        "g", "id", "v", k, "b1"))
      val once = served()
      assert(!IncrementalQuantiles.append(rows(50, 100), name, buckets,
        "g", "id", "v", k, "b1"))
      assert(served() == once)
      IncrementalQuantiles.consolidate(spark, name, k, maxFilesPerBucket = 1)
      assert(!IncrementalQuantiles.append(rows(50, 100), name, buckets,
        "g", "id", "v", k, "b1"))
      assert(served() == once)
    } finally drop()
  }

  test("rebuildGroups recomputes touched groups from surviving raw rows") {
    try {
      IncrementalQuantiles.buildIndex(rows(0, 200), name, buckets,
        "g", "id", "v", k)
      val gonePred = col("g") === 1 && col("v") >= 500
      val remaining = rows(0, 200).filter(!gonePred)
      val n = IncrementalQuantiles.rebuildGroups(spark, name, buckets,
        remaining, "g", "id", "v", k,
        rows(0, 200).filter(gonePred).select("g"))
      assert(n > 0)
      assert(served() == oracle(remaining))
    } finally drop()
  }
}
