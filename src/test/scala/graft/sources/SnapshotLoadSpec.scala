package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The round-12 default-load contract: load() returns a SNAPSHOT —
  * an explicit manifest-pinned file list that keeps the bucket spec —
  * so a pre-planned lazy DataFrame evaluated ACROSS a racing
  * maintenance commit reads exactly the generation it resolved:
  * never a mixed generation, never a FileNotFound (retention > 1),
  * while a fresh load() after the commit serves the new head. */
class SnapshotLoadSpec extends SparkSuite {
  import spark.implicits._

  test("a pre-planned load() frame is stable across a racing merge commit; a fresh load sees it") {
    val table = "graft_snap_race"
    try {
      Bucketed.save(
        (0 until 2000).map(i => (i.toLong, i.toLong * 10)).toDF("k", "v"),
        table, Seq("k"), 4)
      Bucketed.setRetention(spark, table, 4)
      // pre-plan the frame BEFORE the commit, evaluate only after
      val pinned = Bucketed.load(spark, table)
      val pinnedAgg = pinned.agg(count(lit(1)), sum("v"))
      // racing commits: a merge (rewrites two buckets) + an append
      Bucketed.mergeByKey(spark, table,
        (0 until 500).map(i => (i.toLong, -1L)).toDF("k", "v"))
      Bucketed.save(
        (2000 until 2100).map(i => (i.toLong, 7L)).toDF("k", "v"),
        table, Seq("k"), 4, mode = org.apache.spark.sql.SaveMode.Append)
      // the pinned frame still reads its own generation exactly — no
      // FNF (files stayed in place), no mixed generation (explicit
      // file list), values untouched by the merge
      val r = pinnedAgg.head()
      assert(r.getLong(0) == 2000L, s"pinned count: ${r.getLong(0)}")
      assert(r.getLong(1) == (0L until 2000L).map(_ * 10).sum,
        s"pinned sum: ${r.getLong(1)}")
      assert(pinned.filter(col("v") === -1L).count() == 0L)
      // a FRESH load serves the post-commit head
      val fresh = Bucketed.load(spark, table)
      assert(fresh.count() == 2100L)
      assert(fresh.filter(col("v") === -1L).count() == 500L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("snapshot frames keep the bucket spec (zero-Exchange co-located join) and push filters") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 3000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 3000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      Bucketed.save(a, "graft_snap_a", Seq("k"), 4)
      Bucketed.save(b, "graft_snap_b", Seq("k"), 4)
      val joined = Bucketed.load(spark, "graft_snap_a")
        .join(Bucketed.load(spark, "graft_snap_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"snapshot-resolved co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 3000)
      // predicate pushdown reaches the explicit-file-list scan
      val filtered = Bucketed.load(spark, "graft_snap_a")
        .filter(col("k") === 17L)
      val fplan = filtered.queryExecution.executedPlan.toString
      assert(fplan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,17)]"),
        s"filter must push into the snapshot scan:\n$fplan")
      assert(filtered.count() == 1)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_snap_a")
      spark.sql("DROP TABLE IF EXISTS graft_snap_b")
    }
  }

  test("hot-path load() is cache-served; schema evolution invalidates without a generation bump") {
    val table = "graft_snap_evolve"
    try {
      Bucketed.save(
        (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v"),
        table, Seq("k"), 2)
      val first = Bucketed.load(spark, table)
      // same generation → the SAME cached frame instance (zero FS calls)
      assert(Bucketed.load(spark, table) eq first)
      Bucketed.addColumn(spark, table, "note", "STRING")
      val evolved = Bucketed.load(spark, table)
      assert(!(evolved eq first),
        "addColumn must invalidate the cached snapshot frame")
      assert(evolved.columns.toSeq == Seq("k", "v", "note"))
      assert(evolved.filter(col("note").isNull).count() == 100)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
