package graft

import org.apache.spark.sql.SparkSession

/** Job-floor probe (dev tool, not part of the driver contract): ~60 of
  * the bench queries sit at 0.1–0.5 s regardless of data size — ~18 s
  * of the sf0.1 total. This decomposes that floor for a sample of
  * sub-second queries: DataFrame construction (query-registry code),
  * driver-side planning (analyze + optimize + physical planning,
  * forced via `executedPlan`), and execution (noop write, which pays
  * codegen compile on first run and scheduling + task dispatch on
  * every run). Each query runs twice so the second run isolates the
  * steady-state floor from one-time codegen/JIT.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.FloorProbe [q...]"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      // attribution knob: AQE turns each shuffle-bearing query into
      // sequential jobs with a re-plan between stages — measure its
      // share of the floor with SPARK_GRAFT_AQE=false
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_minmax_dates", "q10_first_match", "q15_id_algebra",
        "q17_null_fill", "q20_path_ops", "q26_simhash", "q44_hash_sample",
        "q62_pivot", "q79_topk_per_group", "q99_srp_sketch")
    // same warm-up as Bench: footers + noop sink + shared JIT paths
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    for (name <- names; run <- 1 to 2) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analyze + optimize + plan
      val tPlan = ms(t1)
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val tExec = ms(t2)
      println(f"""FLOOR {"q":"$name","run":$run,"build_ms":$tBuild%.0f,"plan_ms":$tPlan%.0f,"exec_ms":$tExec%.0f}""")
    }
    spark.stop()
  }
}
