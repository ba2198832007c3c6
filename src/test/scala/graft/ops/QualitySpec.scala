package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the one-pass data-quality report: metric arithmetic, null
  * handling, uniqueness over struct keys, empty-table vacuous pass, and
  * the single-aggregation plan shape. */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), Some(5.0)),
    (2L, None, Some(50.0)),
    (3L, Some("c"), None),
    (3L, Some("d"), Some(500.0)))
    .toDF("id", "name", "score")

  test("report: completeness, uniqueness, range metrics are integer-exact") {
    val rows = Quality.report(df,
        completeness = Seq("name"),
        uniqueness = Seq(Seq("id")),
        ranges = Seq(("score", 0.0, 100.0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.map(_._1).toSeq ==
      Seq("completeness:name", "range:score", "uniqueness:id")) // sorted
    val byName = rows.map(r => r._1 -> r).toMap
    assert(byName("completeness:name") ==
      ("completeness:name", 3L, 4L, 750000L, false))
    // null score fails the range check; 500 out of range
    assert(byName("range:score") == ("range:score", 2L, 4L, 500000L, false))
    // id 3 duplicated: 3 distinct of 4
    assert(byName("uniqueness:id") == ("uniqueness:id", 3L, 4L, 750000L, false))
  }

  test("report: all-pass table and empty-table vacuous pass") {
    val ok = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val r = Quality.report(ok, completeness = Seq("name"),
        uniqueness = Seq(Seq("id")))
      .collect()
    assert(r.forall(_.getBoolean(4)))
    assert(r.forall(_.getLong(3) == 1000000L))
    val empty = Quality.report(ok.filter(lit(false)),
        completeness = Seq("name"), ranges = Seq(("id", 0.0, 1.0)))
      .collect()
    assert(empty.forall(row => row.getBoolean(4) && row.getLong(3) == 1000000L))
  }

  test("report: multi-column uniqueness counts distinct key tuples") {
    val d = Seq((1L, "x"), (1L, "y"), (1L, "x")).toDF("a", "b")
    val r = Quality.report(d, uniqueness = Seq(Seq("a", "b"))).collect()
    assert(r.head.getString(0) == "uniqueness:a+b")
    assert(r.head.getLong(1) == 2L && r.head.getLong(2) == 3L)
  }

  test("report plan is one aggregation pass (no join, no window)") {
    val p = Quality.report(df, completeness = Seq("name"),
        ranges = Seq(("score", 0.0, 100.0)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }
}
