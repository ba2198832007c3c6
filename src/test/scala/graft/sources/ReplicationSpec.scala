package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Resumable replication: bootstrap + sync bring a replica to the
  * source head shipping one net diff per sync, a stale bookmark
  * (crash between apply and bookmark write) re-applies idempotently,
  * and a bookmark that fell out of the source's retention window
  * fails loudly instead of shipping a partial delta. */
class ReplicationSpec extends SparkSuite {
  import spark.implicits._

  private def mk(table: String, lo: Int, hi: Int): Unit =
    Bucketed.save((lo until hi).map(i => (i.toLong, i.toLong * 2))
      .toDF("k", "v"), table, Seq("k"), 4)

  private def stateOf(table: String): Set[(Long, Long)] =
    Bucketed.load(spark, table).as[(Long, Long)].collect().toSet

  test("bootstrap + repeated sync track the source across appends, updates, and deletes") {
    val src = "graft_repl_src"; val dst = "graft_repl_dst"
    try {
      mk(src, 0, 50)
      Bucketed.setRetention(spark, src, 8)
      val g0 = Replication.bootstrap(spark, src, dst, buckets = 4)
      assert(Replication.bookmark(spark, dst).contains(g0))
      assert(stateOf(dst) == stateOf(src))
      // first change set: append + keyed update
      Bucketed.save((50 until 70).map(i => (i.toLong, i.toLong * 2))
        .toDF("k", "v"), src, Seq("k"), 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      Bucketed.mergeByKey(spark, src,
        (0 until 70 by 7).map(i => (i.toLong, 999L)).toDF("k", "v"))
      val b1 = Replication.sync(spark, src, dst)
      assert(b1 == Bucketed.currentGeneration(spark, src))
      assert(stateOf(dst) == stateOf(src))
      // caught-up sync is a no-op
      assert(Replication.sync(spark, src, dst) == b1)
      // second change set: keyed delete — resume from the bookmark
      Bucketed.mergeByKey(spark, src,
        (0 until 70 by 11).map(i => (i.toLong, 0L, true))
          .toDF("k", "v", "del"), deleteCol = Some("del"))
      Replication.sync(spark, src, dst)
      assert(stateOf(dst) == stateOf(src))
      assert(stateOf(dst).nonEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $src")
      spark.sql(s"DROP TABLE IF EXISTS $dst")
    }
  }

  test("a stale bookmark (crash between apply and bookmark write) re-applies idempotently") {
    val src = "graft_repl_stale_src"; val dst = "graft_repl_stale_dst"
    try {
      mk(src, 0, 30)
      Bucketed.setRetention(spark, src, 8)
      val g0 = Replication.bootstrap(spark, src, dst, buckets = 4)
      Bucketed.mergeByKey(spark, src,
        Seq((3L, 333L), (100L, 100L)).toDF("k", "v"))
      // simulate the crash window: the diff was APPLIED but the
      // bookmark write never happened
      Bucketed.applyChanges(spark, dst,
        Bucketed.diffGenerations(spark, src, g0,
          Bucketed.currentGeneration(spark, src)))
      assert(Replication.bookmark(spark, dst).contains(g0)) // stale
      // the retried sync re-applies the same diff — no duplicates,
      // no lost rows — and advances the bookmark
      val b = Replication.sync(spark, src, dst)
      assert(b == Bucketed.currentGeneration(spark, src))
      assert(stateOf(dst) == stateOf(src))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $src")
      spark.sql(s"DROP TABLE IF EXISTS $dst")
    }
  }

  test("a bookmark behind the retention window fails loudly") {
    val src = "graft_repl_gone_src"; val dst = "graft_repl_gone_dst"
    try {
      mk(src, 0, 20)
      Bucketed.setRetention(spark, src, 2)
      Replication.bootstrap(spark, src, dst, buckets = 4)
      // three commits: the bookmarked generation falls out of the
      // 2-generation window (auto-pruned at each maintenance commit)
      (1 to 3).foreach { i =>
        Bucketed.mergeByKey(spark, src, Seq((i.toLong, -1L)).toDF("k", "v"))
      }
      val e = intercept[IllegalStateException] {
        Replication.sync(spark, src, dst)
      }
      assert(e.getMessage.contains("re-bootstrap"))
      // re-bootstrap recovers
      Replication.bootstrap(spark, src, dst, buckets = 4)
      assert(stateOf(dst) == stateOf(src))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $src")
      spark.sql(s"DROP TABLE IF EXISTS $dst")
    }
  }
}
