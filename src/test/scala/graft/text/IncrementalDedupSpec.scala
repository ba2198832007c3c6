package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Index-and-probe incremental near-dup dedup: candidates must equal
  * the batch LSH pairs restricted to shard×corpus, the probe join must
  * be Exchange-free on the index side, and a small shard must
  * bucket-prune the index scan. */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private val table = "graft_inc_dedup_idx"
  private val buckets = 8

  // deterministic distinct texts; dups are verbatim copies
  private def text(i: Int): String =
    (0 until 12).map(j => s"w${(i * 31 + j * 7) % 9973}x$i").mkString(" ")

  private def corpus = (0 until 40)
    .map(i => (i.toLong, text(i))).toDF("doc_id", "text")
  // 100-102 copy corpus docs 5/17/29; 103-105 are novel
  private def shard = Seq(
    (100L, text(5)), (101L, text(17)), (102L, text(29)),
    (103L, text(900)), (104L, text(901)), (105L, text(902)))
    .toDF("doc_id", "text")

  test("probe equals the uncapped batch pairs restricted to shard×corpus") {
    try {
      IncrementalDedup.buildIndex(corpus, table, buckets)
      val got = IncrementalDedup.probe(spark, shard, table)
        .as[(Long, Long)].collect().toSet
      val batchPairs = Dedup.minhashCandidatePairs(
          corpus.unionByName(shard), maxBucket = 0)
        .as[(Long, Long)].collect().toSet
      val expected = batchPairs.collect {
        case (a, b) if a < 100 && b >= 100 => (b, a)
        case (a, b) if b < 100 && a >= 100 => (a, b)
      }
      assert(got == expected && got.nonEmpty, s"got=$got expected=$expected")
      assert(got.map(_._1) == Set(100L, 101L, 102L))
      // novel = shard rows with no candidate
      val nov = IncrementalDedup.novel(spark, shard, table)
        .select("doc_id").as[Long].collect().toSet
      assert(nov == Set(103L, 104L, 105L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("probe join is Exchange-free on the index side; small shards bucket-prune") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      IncrementalDedup.buildIndex(corpus, table, buckets)
      // pruneKeys=0 → full co-located join: exactly two Exchanges total
      // (the shard's bands, the final distinct) — an index-side shuffle
      // would make it three
      val full = IncrementalDedup.probe(spark, shard, table, pruneKeys = 0)
      val fullPlan = full.queryExecution.executedPlan.toString
      val nExchanges = "(?<!Reused)Exchange".r.findAllIn(fullPlan).size
      assert(nExchanges == 2,
        s"expected 2 Exchanges (shard + distinct), got $nExchanges:\n$fullPlan")
      assert(full.count() == 3)
      // small shard with pruning on: the index scan reads only the
      // buckets the shard's band keys hash into — a 1-doc shard has 4
      // band keys, which cannot cover all 8 buckets
      val one = shard.filter(col("doc_id") === 100L)
      val pruned = IncrementalDedup.probe(spark, one, table)
      val prunedPlan = pruned.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(prunedPlan)
      assert(sel.isDefined, s"expected bucket pruning:\n$prunedPlan")
      assert(sel.get.group(1).toInt <= 4 && sel.get.group(2).toInt == 8,
        s"expected at most 4 of 8 buckets: ${sel.get.matched}")
      assert(pruned.as[(Long, Long)].collect().toSet
        == full.as[(Long, Long)].collect().toSet
          .filter(_._1 == 100L))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("appendToIndex keeps the index current across shards") {
    try {
      IncrementalDedup.buildIndex(corpus, table, buckets)
      IncrementalDedup.appendToIndex(shard, table, buckets)
      // a later shard duplicating one ORIGINAL-corpus doc and one
      // APPENDED doc must hit both
      val next = Seq((200L, text(5)), (201L, text(900))).toDF("doc_id", "text")
      val got = IncrementalDedup.probe(spark, next, table)
        .as[(Long, Long)].collect().toSet
      assert(got.contains((200L, 5L)) && got.contains((201L, 103L)),
        s"got=$got")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
