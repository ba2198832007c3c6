package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.sources.Bucketed

/** Incremental view maintenance: the materialized aggregate follows a
  * governed source through appends, keyed updates, and deletes via
  * per-generation-pair deltas; replayed and partially-crashed
  * refreshes heal through the exactly-once tags; a bookmark behind
  * the retention window fails loudly. */
class IvmSpec extends SparkSuite {
  import spark.implicits._

  private def src(table: String, rows: Seq[(Long, Long, Long)]): Unit = {
    Bucketed.save(rows.toDF("id", "g", "v"), table, Seq("id"), 4)
    Bucketed.setRetention(spark, table, 10)
  }

  private def truth(table: String) =
    Bucketed.load(spark, table).groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_q"))
      .select("g", "n", "sum_q")
      .as[(Long, Long, Long)].collect().toSet

  private def served(view: String) =
    Ivm.serve(spark, view).select("g", "n", "sum_q")
      .as[(Long, Long, Long)].collect().toSet

  test("view follows append, keyed update, and delete; count/sum exact; replay is a no-op") {
    val table = "graft_ivm_src"; val view = "graft_ivm_view"
    try {
      src(table, (0 until 60).map(i => (i.toLong, i % 5L, i.toLong)))
      Ivm.create(spark, table, view, 4, "g", "v")
      assert(served(view) == truth(table))
      // append new ids, update (delete+insert in the delta), delete
      Bucketed.save((60 until 80).map(i => (i.toLong, i % 5L, i.toLong))
        .toDF("id", "g", "v"), table, Seq("id"), 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      Bucketed.mergeByKey(spark, table,
        (0 until 80 by 7).map(i => (i.toLong, i % 5L, i + 1000L))
          .toDF("id", "g", "v"))
      Bucketed.mergeByKey(spark, table,
        (0 until 80 by 11).map(i => (i.toLong, i % 5L, 0L, true))
          .toDF("id", "g", "v", "del"), deleteCol = Some("del"))
      Ivm.refresh(spark, table, view, 4, "g", "v")
      assert(served(view) == truth(table))
      // a replayed refresh (same bookmark path) changes nothing
      Ivm.refresh(spark, table, view, 4, "g", "v")
      assert(served(view) == truth(table))
      // groups that saw retractions serve null min/max (the q155
      // contract); untouched groups keep exact extrema
      val mm = Ivm.serve(spark, view)
        .select("g", "min_q").as[(Long, Option[Long])].collect().toMap
      assert(mm.values.exists(_.isEmpty),
        "retracted groups must serve null min until repair")
      // repair recomputes the retracted groups from the source's
      // current rows: exact min/max everywhere, count/sum unchanged
      assert(Ivm.repair(spark, table, view, 4, "g", "v") > 0)
      assert(served(view) == truth(table))
      val mmTruth = Bucketed.load(spark, table).groupBy("g")
        .agg(min("v").as("mn"), max("v").as("mx"))
        .as[(Long, Long, Long)].collect()
        .map { case (g, mn, mx) => g -> ((mn, mx)) }.toMap
      val mmAfter = Ivm.serve(spark, view)
        .select("g", "min_q", "max_q").as[(Long, Long, Long)].collect()
        .map { case (g, mn, mx) => g -> ((mn, mx)) }.toMap
      assert(mmAfter == mmTruth, "repair must restore exact extrema")
      // repairing a stale view fails loudly
      Bucketed.mergeByKey(spark, table,
        Seq((999L, 0L, 999L)).toDF("id", "g", "v"))
      val e = intercept[IllegalArgumentException] {
        Ivm.repair(spark, table, view, 4, "g", "v")
      }
      assert(e.getMessage.contains("refresh before repairing"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${view}_partials")
    }
  }

  test("a crash between the append half and the bookmark heals on retry") {
    val table = "graft_ivm_crash"; val view = "graft_ivm_crash_view"
    try {
      src(table, (0 until 30).map(i => (i.toLong, i % 3L, i.toLong)))
      val g0 = Ivm.create(spark, table, view, 4, "g", "v")
      Bucketed.mergeByKey(spark, table,
        Seq((100L, 1L, 100L), (101L, 2L, 101L)).toDF("id", "g", "v"))
      val g1 = Bucketed.currentGeneration(spark, table)
      // simulate the crashed half-refresh: the pair's APPEND landed
      // (tag committed), the retract and the bookmark did not
      val diff = Bucketed.diffGenerations(spark, table, g0, g1)
      IncrementalAgg.append(
        diff.filter(col("change") === "insert").select("g", "v"),
        view, 4, "g", "v", s"ivm-$g0-$g1-i")
      // the retried refresh skips the landed half, applies the rest
      Ivm.refresh(spark, table, view, 4, "g", "v")
      assert(served(view) == truth(table))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${view}_partials")
    }
  }

  test("a bookmark behind the source's retention window fails loudly") {
    val table = "graft_ivm_gone"; val view = "graft_ivm_gone_view"
    try {
      Bucketed.save((0 until 20).map(i => (i.toLong, i % 3L, i.toLong))
        .toDF("id", "g", "v"), table, Seq("id"), 4)
      Bucketed.setRetention(spark, table, 2)
      Ivm.create(spark, table, view, 4, "g", "v")
      (1 to 3).foreach { i =>
        Bucketed.mergeByKey(spark, table,
          Seq((i.toLong, i % 3L, -1L)).toDF("id", "g", "v"))
      }
      val e = intercept[IllegalStateException] {
        Ivm.refresh(spark, table, view, 4, "g", "v")
      }
      assert(e.getMessage.contains("recreate"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${view}_partials")
    }
  }
}
