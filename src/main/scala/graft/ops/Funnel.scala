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
  * Scale shape: ONE hash shuffle on the user key with a secondary sort
  * — `repartition(user).sortWithinPartitions(user, ts, tieBreak)` puts
  * each user's events in timestamp order CONTIGUOUSLY in the partition,
  * so the state machine streams through `mapPartitions` holding O(1)
  * state per user (current user, step index, last completion time) and
  * never materializes a user's history. A hot key with 10^8 events
  * costs sort spill, not task memory (the same hardening sessionize
  * got: a groupByKey + toArray would buffer the full per-user history).
  * No self-joins: the naive per-step join formulation scans the events
  * table once per step and re-shuffles each time; this is one scan, one
  * shuffle, any number of steps.
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
      .select(col(userCol).cast("long").as("__u"),
        unix_micros(col(tsCol)).as("__ts"),
        col(typeCol).cast("string").as("__t"),
        col(tieBreakCol).cast("long").as("__tb"))
      .repartition(col("__u"))
      .sortWithinPartitions(col("__u"), col("__ts"), col("__tb"))
      .as[(Long, Long, String, Long)]
      .mapPartitions { it =>
        // streaming per-user state machine over the contiguous sorted
        // run: O(1) state regardless of a user's event count
        var curUser = Long.MinValue
        var started = false
        var si = 0
        var cur = Long.MinValue
        it.flatMap { case (user, ts, typ, _) =>
          if (!started || user != curUser) {
            curUser = user; started = true; si = 0; cur = Long.MinValue
          }
          if (si < stepArr.length && typ == stepArr(si) && ts > cur) {
            cur = ts
            si += 1
            Iterator.single((user, si.toLong, ts))
          } else Iterator.empty
        }
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
