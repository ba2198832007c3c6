package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ shape): a
  * set of completeness / uniqueness / range constraints is verified in
  * ONE aggregation pass over the table, producing a tidy
  * (check, satisfied, total, metric_e6, pass) report row per
  * constraint.
  *
  * Scale design: every constraint compiles to one aggregate expression
  * in a single global agg — partial aggregation does the work map-side
  * and only one row per partition reaches the final reducer. Metrics
  * are integer-exact ((satisfied · 1e6) div total — integer division,
  * replicated verbatim in the q71 oracle), so the report hash-matches
  * any engine. Uniqueness constraints use exact distinct counts over a
  * column struct (null key fields compare equal, like SQL DISTINCT);
  * more than one distinct aggregate plans through Spark's Expand (rows
  * duplicated once per distinct agg in the map stage) — still one
  * pass, but keep the uniqueness list short on very wide scans.
  */
object Quality {

  /** Run the constraint suite; returns one row per check, ordered by
    * check name. `ranges` bounds are inclusive; null values fail a
    * range check and fail completeness, and an empty table passes
    * everything vacuously (0/0 → metric 1e6). */
  def report(df: DataFrame,
             completeness: Seq[String] = Nil,
             uniqueness: Seq[Seq[String]] = Nil,
             ranges: Seq[(String, Double, Double)] = Nil): DataFrame = {
    val checks: Seq[(String, Column)] =
      completeness.map(c => (s"completeness:$c", count(col(c)))) ++
        uniqueness.map(ks => (s"uniqueness:${ks.mkString("+")}",
          countDistinct(struct(ks.map(col): _*)))) ++
        ranges.map { case (c, lo, hi) => (s"range:$c",
          sum(when(col(c).between(lo, hi), 1L).otherwise(0L))) }
    require(checks.nonEmpty, "at least one constraint is required")
    val named = checks.zipWithIndex.map { case ((nm, e), i) =>
      (nm, coalesce(e, lit(0L)).cast("long").as(s"__m$i"), s"__m$i")
    }
    val aggs = count(lit(1)).cast("long").as("__n") +: named.map(_._2)
    val kvs = named.map { case (nm, _, alias) =>
      struct(lit(nm).as("check"), col(alias).as("satisfied"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(kvs: _*)).as("kv"), col("__n").as("total"))
      .select(col("kv.check").as("check"), col("kv.satisfied").as("satisfied"),
        col("total"))
      .withColumn("metric_e6",
        when(col("total") === 0, lit(1000000L))
          .otherwise(expr("(satisfied * 1000000) div greatest(total, 1)")))
      .withColumn("pass", col("metric_e6") === 1000000L)
      .orderBy("check")
  }
}
