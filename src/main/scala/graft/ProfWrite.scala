package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement-only main (guide §1): isolates the fixed cost of the
  * governed append's WRITE phase — Spark's bucketed `saveAsTable`
  * machinery vs a plain parquet write of the SAME clustered rows — so
  * the optimization targets the measured term, not a guess. Writes
  * nothing the queries read; not part of any query path. */
object ProfWrite {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def rows(n: Int) = (0 until n)
      .map(i => (i % 16, i.toLong, Array.fill(8)(i % 7)))
      .toDF("centroid", "id", "codes")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[profw] $tag ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    val base = graft.streaming.Streaming.scratchBase
      .resolve(s"graft-profw-${System.nanoTime()}").toString
    val tbl = "graft_profw_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // warm-up both paths once
    rows(500).repartition(8, col("centroid")).write
      .bucketBy(8, "centroid").sortBy("centroid").format("parquet")
      .saveAsTable(tbl)
    rows(500).repartition(8, col("centroid"))
      .sortWithinPartitions("centroid")
      .write.mode("overwrite").parquet(s"$base/warm")
    for (i <- 1 to 5) {
      time(s"saveAsTable-append $i") {
        rows(500).repartition(8, col("centroid")).write
          .mode(SaveMode.Append)
          .bucketBy(8, "centroid").sortBy("centroid").format("parquet")
          .saveAsTable(tbl)
      }
      time(s"plain-parquet-dir $i") {
        rows(500).repartition(8, col("centroid"))
          .sortWithinPartitions("centroid")
          .write.mode("overwrite").parquet(s"$base/p$i")
      }
      time(s"noop-sink $i") {
        rows(500).repartition(8, col("centroid"))
          .sortWithinPartitions("centroid")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // isolate the fixed per-job cost: no shuffle, 1 partition, noop
    for (i <- 1 to 3) {
      time(s"noop-1part $i") {
        rows(500).coalesce(1).write.format("noop").mode("overwrite").save()
      }
      time(s"noop-range $i") {
        spark.range(500).write.format("noop").mode("overwrite").save()
      }
    }
    // AQE on vs off for the tiny shuffle+write job
    for (i <- 1 to 3) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      time(s"noop-shuffle-aqe-off $i") {
        rows(500).repartition(8, col("centroid"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"parquet-aqe-off $i") {
        rows(500).repartition(8, col("centroid"))
          .sortWithinPartitions("centroid")
          .write.mode("overwrite").parquet(s"$base/paqe$i")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      time(s"noop-shuffle-aqe-on $i") {
        rows(500).repartition(8, col("centroid"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"parquet-aqe-on $i") {
        rows(500).repartition(8, col("centroid"))
          .sortWithinPartitions("centroid")
          .write.mode("overwrite").parquet(s"$base/paqn$i")
      }
    }
    spark.stop()
  }
}
