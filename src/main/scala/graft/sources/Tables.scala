package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders. */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Single-file parquet inputs arrive with as few partitions as the
    * file has row groups (1–2 at bench scale), which serializes every
    * downstream map stage onto one or two cores. Widen to the session's
    * parallelism when the source is under-partitioned; well-partitioned
    * inputs (the 100 TB case: many files / row groups) pass through
    * untouched. The round-robin exchange moves only the NARROW source
    * rows — worth it when a fan-out (triple explode, signature math)
    * multiplies work per row downstream.
    *
    * The partition probe (`df.rdd`) runs ONLY on shuffle-free plans: on
    * a plan with exchanges, `.rdd` under AQE materializes every upstream
    * query stage at composition time (and such plans already carry
    * ~shuffle.partitions partitions, so widening is moot anyway). */
  def widen(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val shuffleBearing = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Distinct | _: Deduplicate |
           _: Window | _: Sort | _: RepartitionOperation => true
      case _ => false
    }
    if (shuffleBearing) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }

  /** The events table is written with parquet TIMESTAMP(NANOS), which
    * Spark has no native type for (PARQUET_TYPE_ILLEGAL). Read nanos as
    * long (legacy conf) and truncate to microsecond timestamps — the same
    * value DuckDB's epoch_us sees, so oracle comparisons stay exact.
    * `div` is integer division: nanos ≈ 1.7e18 exceed double's 2^53
    * mantissa, a `/`-based conversion would corrupt timestamps. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
