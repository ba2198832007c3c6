package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The shared maintenance core's observability surface: the per-list
  * load profile must count exactly, normalize against OCCUPIED lists,
  * rank planted skew, and stay one partial-agg + broadcast fold (no
  * collect, no window). */
class IndexMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("listLoadProfile counts, normalizes over occupied lists, ranks skew") {
    val table = "graft_idxmaint_load_idx"
    try {
      // planted profile: centroid 0 → 60 postings, 1 → 30, 2 → 10;
      // centroid 3 exists in the codebook but gets NO postings — the
      // denominator must be the 3 occupied lists, not 4, or skew is
      // understated exactly when a list has starved empty
      val rows = (0 until 60).map(i => (0, i.toLong)) ++
        (0 until 30).map(i => (1, 1000L + i)) ++
        (0 until 10).map(i => (2, 2000L + i))
      Bucketed.save(rows.toDF("centroid", "id"), table,
        Seq("centroid"), 4)
      val got = IndexMaintenance.listLoadProfile(spark, table)
        .select("centroid", "n_postings", "load_e6")
        .as[(Int, Long, Long)].collect().sortBy(_._1)
      // total 100 over 3 occupied lists → mean 33.33; load_e6 =
      // floor(n * 3 / 100 * 1e6)
      assert(got.toSeq == Seq(
        (0, 60L, 1800000L), (1, 30L, 900000L), (2, 10L, 300000L)))
      // the refresh trigger reads the max: the fattest list is 1.8x
      // its fair share — and that fact survives quantization exactly
      assert(got.map(_._3).max == 1800000L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("load profile plan: one partial-agg shuffle + broadcast fold, no window") {
    val table = "graft_idxmaint_plan_idx"
    try {
      Bucketed.save((0 until 100).map(i => (i % 5, i.toLong))
        .toDF("centroid", "id"), table, Seq("centroid"), 4)
      val df = IndexMaintenance.listLoadProfile(spark, table)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec"), s"unexpected window:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"),
        s"scalar fold must broadcast, not shuffle:\n$plan")
      assert(df.count() == 5)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
