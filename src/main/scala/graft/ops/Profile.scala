package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution profiling — the pre-flight check that DECIDES the scale
  * strategy: a key whose share is a few percent of a 100 TB fact table
  * is the signal to salt a join ([[Relational.saltedJoin]]) or lean on
  * AQE skew handling before the job runs, not after it dies.
  */
object Profile {

  /** Top-`topN` heaviest key tuples with exact counts and integer-exact
    * corpus share (n·1e6 div total). One partial-agg count shuffle on
    * the keys, a broadcast 1-row total folded into the plan (no eager
    * job), and a TakeOrdered for the top-N — only `topN` rows ever
    * reach the driver/output. Deterministic order: count desc, then
    * key columns asc. */
  /** Per-group HLL++ distinct-count sketch next to the exact row count —
    * the 100 TB dedup-stats shape (SURVEY §2 extension target): the
    * sketch is fixed-size mergeable state, so the full-corpus pass is
    * one partial aggregation with map-side combine, no shuffle of
    * values. `rsd` is the HLL relative standard deviation (Spark
    * default 0.05). Deterministic for fixed input + rsd (hash-based, no
    * RNG; merge order-independent), but NOT hash-comparable across
    * engines — the driver records a rows-only check; ProfileSpec gates
    * accuracy against exact distinct counts. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  def keySkew(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).cast("long").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_e6", expr("n * 1000000 div greatest(__total, 1)"))
      .drop("__total")
      .orderBy(col("n").desc +: keys.map(col(_).asc): _*)
      .limit(topN)
  }
}
