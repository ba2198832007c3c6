package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the product-analytics staple (view ->
  * click -> purchase conversion): for each user, the earliest
  * timestamp at which each funnel step completes, where step i+1 only
  * counts STRICTLY AFTER step i's completion time. Emitted long-format:
  * one row per (user, completed step) — any step count works, and the
  * per-step conversion funnel is a trivial groupBy(step) on top.
  *
  * Semantics pinned by the q110 oracle: step 1's time is the user's
  * minimum step-1 event time; step i+1's time is the minimum step-i+1
  * event time strictly greater than step i's — the standard
  * "first qualifying completion" funnel. Ties at the exact same
  * microsecond do NOT advance (strict >), identically in both engines.
  *
  * Scale shape: ONE hash shuffle on the user key; each user's events
  * fold through a compiled single-pass state machine (sorted by
  * (ts, event_id) for determinism — per-user event counts are bounded
  * in any real funnel window, and nothing user-crossing is ever held in
  * memory). No self-joins: the naive per-step join formulation scans
  * the events table once per step and re-shuffles each time; this is
  * one scan, one shuffle, any number of steps.
  */
object Funnel {

  /** (user_id, step [1-based], ts_us) for every step each user
    * completed, in funnel order. Users completing zero steps emit
    * nothing. */
  def analyze(events: DataFrame, steps: Seq[String],
              userCol: String = "user_id", typeCol: String = "event_type",
              tsCol: String = "ts",
              tieBreakCol: String = "event_id"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepArr = steps.toArray
    events
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(typeCol).cast("string"), col(tieBreakCol).cast("long"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (user, it) =>
        val evs = it.toArray.sortBy(t => (t._2, t._4))
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](
          stepArr.length)
        var si = 0
        var cur = Long.MinValue
        var i = 0
        while (i < evs.length && si < stepArr.length) {
          val ts = evs(i)._2
          if (evs(i)._3 == stepArr(si) && ts > cur) {
            out += ((user, si + 1L, ts))
            cur = ts
            si += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF(userCol, "step", "ts_us")
  }

  /** Conversion summary over [[analyze]] output: (step, n_users). */
  def conversions(funnel: DataFrame): DataFrame =
    funnel.groupBy("step").agg(count(lit(1)).as("n_users"))

  /** Cohort retention — the third leg of the product-analytics trio
    * (with sessionization and the funnel): users are cohorted by their
    * FIRST activity date; retention(c, n) = how many of cohort c were
    * active again exactly n days later, for n in [0, maxDays].
    * Output: (cohort_date, day_offset, n_users), day 0 = cohort size.
    *
    * Scale shape: per-user first date is one partial-agg shuffle on the
    * user key; daily activity is a distinct on (user, date) — same key,
    * so the cohort join co-partitions (no extra exchange under AQE);
    * the final rollup aggregates on (cohort, offset). No windows, no
    * per-day self-joins (the naive day-N formulation joins activity to
    * itself once per N). */
  def retention(events: DataFrame, maxDays: Int = 7,
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    require(maxDays >= 0, "maxDays must be >= 0")
    val activity = events
      .select(col(userCol).cast("long").as("__u"),
        to_date(col(tsCol)).as("__d"))
      .distinct()
    val cohorts = activity.groupBy("__u").agg(min("__d").as("__c"))
    activity.join(cohorts, "__u")
      .withColumn("day_offset", datediff(col("__d"), col("__c")).cast("long"))
      .filter(col("day_offset") <= maxDays)
      .groupBy(col("__c").as("cohort_date"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
