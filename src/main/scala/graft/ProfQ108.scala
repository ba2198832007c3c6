package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement-only main (guide §1): q108's composition, timed stage
  * by stage with the noop sink, so the optimization targets the
  * measured stage, not a guess. Not part of any query path. */
object ProfQ108 {
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
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
        def docs = graft.sources.Tables.table(spark, sfDir, "documents")
    def time[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[q108prof] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      System.err.println(s"[q108prof] --- round $round ---")
      val d = docs
      val ev = d.filter(col("doc_id") % 13 === 0)
      val deduped = time("1-2 gate+dedup")(
        { val x = CleanCorpus.gatedDeduped(d, 3000, Seq("en"), "text", "doc_id"); noop(x); x })
      val cand = time("3a candidates")(
        { val x = Dedup.minhashCandidatePairs(deduped, "text", "doc_id",
            k = 3, numHashes = 16, bands = 4, portable = true, maxBucket = 0); noop(x); x })
      val confirmed = time("3b jaccard confirm")(
        { val x = Dedup.ngramJaccardScaled(deduped, cand, "text", "doc_id",
            k = 2, portable = true)
            .filter(col("jaccard_e4") >= 6000).select("doc_a", "doc_b"); noop(x); x })
      val clusters = time("3c components")(
        { val x = Components.dedupClusters(deduped, confirmed, "doc_id"); noop(x); x })
      val reps = clusters.filter(col("kept") === 1L).select(col("doc_id"), col("component"))
      val repDocs = deduped.join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
      val clean = time("4 contamination")(
        { val x = Curation.contamination(train = ev, test = repDocs,
            "text", "doc_id", k = 8, portable = true)
            .filter(col("contam_e4") < 2000).select("doc_id"); noop(x); x })
      val split = time("5 split")(
        { val x = Curation.leakageSafeSplit(reps.join(clean, Seq("doc_id"), "left_semi"))
            .select(col("doc_id"), col("component"), col("split"))
            .localCheckpoint(eager = false); noop(x); x })
      time("6 pack+join")(
        noop(Curation.packSequences(repDocs.join(split, Seq("doc_id")),
            budget = 512L, shardCol = "split", idCol = "doc_id", textCol = "text")
          .join(split.select(col("doc_id"), col("component")), Seq("doc_id"))))
      time("full prepare")(
        noop(TrainingData.prepare(d, eval = ev, maxBucket = 0).orderBy("doc_id")))
    }
    spark.stop()
  }
}
