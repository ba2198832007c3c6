package graft.ops

import org.apache.spark.sql.functions._

class FunnelSpec extends graft.SparkSuite {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def events(rows: (Long, Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "us", "event_type", "event_id")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("event_id"))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.analyze(df, steps).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("first qualifying completion per step, strictly ordered") {
    val out = run(events(
      (1L, 10L, "view", 1L), (1L, 5L, "click", 2L), // click BEFORE view: ignored
      (1L, 20L, "click", 3L), (1L, 30L, "purchase", 4L),
      (1L, 15L, "view", 5L))) // later view ignored (min view = 10)
    assert(out == Map((1L, 1L) -> 10L, (1L, 2L) -> 20L, (1L, 3L) -> 30L))
  }

  test("drop-off: users emit only the steps they reach") {
    val out = run(events(
      (1L, 10L, "view", 1L),                       // stops at step 1
      (2L, 10L, "view", 2L), (2L, 20L, "click", 3L), // stops at step 2
      (3L, 10L, "click", 4L)))                     // never views: no rows
    assert(out.keySet == Set((1L, 1L), (2L, 1L), (2L, 2L)))
  }

  test("same-microsecond events do not advance (strict >)") {
    val out = run(events(
      (1L, 10L, "view", 1L), (1L, 10L, "click", 2L), // tie: click ignored
      (1L, 11L, "click", 3L)))
    assert(out == Map((1L, 1L) -> 10L, (1L, 2L) -> 11L))
  }

  test("conversions summary counts users per step") {
    val f = Funnel.analyze(events(
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L),
      (2L, 10L, "view", 3L)), steps)
    val c = Funnel.conversions(f).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c == Map(1L -> 2L, 2L -> 1L))
  }

  test("retention: first-activity cohorts, day offsets, maxDays cut") {
    val us = 86400L * 1000000L // one day in micros
    val e = events(
      // user 1: cohort day 0, active days 0, 1, 3 (two events day 0 —
      // distinct-date dedup must count it once)
      (1L, 0L, "view", 1L), (1L, 1000L, "click", 2L),
      (1L, us, "view", 3L), (1L, 3 * us, "view", 4L),
      // user 2: same cohort, only day 0
      (2L, 2000L, "view", 5L),
      // user 3: cohort day 1, active days 1 and 10 (10 > maxDays: cut)
      (3L, us, "view", 6L), (3L, 10 * us, "view", 7L))
    val r = Funnel.retention(e, maxDays = 7)
      .collect().map(x => (x.getDate(0).toString, x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r(("1970-01-01", 0L)) == 2L) // users 1 and 2
    assert(r(("1970-01-01", 1L)) == 1L) // user 1
    assert(r(("1970-01-01", 3L)) == 1L) // user 1
    assert(r(("1970-01-02", 0L)) == 1L) // user 3's own cohort
    assert(!r.keySet.exists(_._2 > 7L), "offsets beyond maxDays must be cut")
    assert(r.size == 4)
  }

  test("plan: one events pass, one user shuffle, no joins") {
    val plan = Funnel.analyze(events((1L, 10L, "view", 1L)), steps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"exactly one user-key shuffle expected:\n$plan")
  }
}
