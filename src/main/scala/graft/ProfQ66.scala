package graft

import org.apache.spark.sql.SparkSession

/** Measurement-only main (guide §1): q66's stream-stream join at
  * different state-partition counts, with the engine's own per-batch
  * durationMs breakdown — the evidence for (or against) resizing its
  * state partitioning. Not part of any query path. */
object ProfQ66 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (parts <- Seq(8, 4, 2, 8, 4, 2)) {
      val name = s"q66prof_${parts}_${System.nanoTime()}"
      val t0 = System.nanoTime()
      graft.streaming.Streaming.withStatePartitions(spark, Some(parts)) {
        val q = graft.streaming.Streaming.correlate(
            graft.streaming.Streaming.eventStream(spark, s"$sfDir/events.parquet"),
            leftType = "view", rightType = "purchase", withinHours = 24)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory(
              graft.streaming.Streaming.scratchBase, s"graft-ckpt-$name")
              .toString)
          .start()
        q.awaitTermination()
        val secs = (System.nanoTime() - t0) / 1e9
        val prog = q.recentProgress.map { p =>
          s"batch=${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}"
        }.mkString("; ")
        System.err.println(f"[q66prof] parts=$parts total=$secs%.2f s  $prog")
      }
    }
    spark.stop()
  }
}
