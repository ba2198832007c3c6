package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The shared maintenance core's observability surface: the per-list
  * load profile must count exactly, normalize against OCCUPIED lists,
  * rank planted skew, and stay one partial-agg + broadcast fold (no
  * collect, no window). */
class IndexMaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("listLoadProfile counts, normalizes over occupied lists, ranks skew") {
    val table = "graft_idxmaint_load_idx"
    try {
      // planted profile: centroid 0 → 60 postings, 1 → 30, 2 → 10;
      // centroid 3 exists in the codebook but gets NO postings — the
      // denominator must be the 3 occupied lists, not 4, or skew is
      // understated exactly when a list has starved empty
      val rows = (0 until 60).map(i => (0, i.toLong)) ++
        (0 until 30).map(i => (1, 1000L + i)) ++
        (0 until 10).map(i => (2, 2000L + i))
      Bucketed.save(rows.toDF("centroid", "id"), table,
        Seq("centroid"), 4)
      val got = IndexMaintenance.listLoadProfile(spark, table)
        .select("centroid", "n_postings", "load_e6")
        .as[(Int, Long, Long)].collect().sortBy(_._1)
      // total 100 over 3 occupied lists → mean 33.33; load_e6 =
      // floor(n * 3 / 100 * 1e6)
      assert(got.toSeq == Seq(
        (0, 60L, 1800000L), (1, 30L, 900000L), (2, 10L, 300000L)))
      // the refresh trigger reads the max: the fattest list is 1.8x
      // its fair share — and that fact survives quantization exactly
      assert(got.map(_._3).max == 1800000L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("maintainIfNeeded: balanced+compact index is a no-op; oversized buckets compact; skew triggers the refresh hook") {
    val table = "graft_idxmaint_policy_idx"
    try {
      // balanced: 4 lists × 25 postings, one file per bucket
      Bucketed.save((0 until 100).map(i => (i % 4, i.toLong))
        .toDF("centroid", "id").repartition(4, col("centroid")),
        table, Seq("centroid"), 4)
      var hookRuns = 0
      val d0 = IndexMaintenance.maintainIfNeeded(spark, table,
        refresh = Some(() => hookRuns += 1))
      assert(d0.compactedBuckets == 0 && !d0.refreshed && !d0.refreshNeeded,
        s"balanced index must be a no-op: $d0")
      assert(hookRuns == 0)
      assert(d0.maxLoadE6 == 1000000L, s"4 even lists: $d0")
      // append-per-batch growth: six appends → file counts cross the
      // threshold → the policy compacts (and only compacts)
      (0 until 6).foreach { b =>
        Bucketed.save(Seq((b % 4, 1000L + b)).toDF("centroid", "id"),
          table, Seq("centroid"), 4,
          mode = org.apache.spark.sql.SaveMode.Append)
      }
      val d1 = IndexMaintenance.maintainIfNeeded(spark, table,
        refresh = Some(() => hookRuns += 1))
      assert(d1.compactedBuckets > 0, s"oversized buckets must compact: $d1")
      assert(!d1.refreshed && hookRuns == 0)
      // DRIFT: pile postings into one list (the corpus moved away from
      // the codebook) — the policy must invoke the family's refresh
      // hook, and the hook's rebalance must be visible in the profile
      Bucketed.save((0 until 300).map(i => (0, 5000L + i))
        .toDF("centroid", "id"), table, Seq("centroid"), 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      val rebalance: () => Unit = () => {
        hookRuns += 1
        // family-specific cure, stubbed: re-key every posting evenly
        // (a real family re-trains centroids / re-encodes codes)
        Bucketed.rewriteAll(spark, table,
          _.withColumn("centroid",
            org.apache.spark.sql.functions.pmod(col("id"), lit(4))
              .cast("int")))
        ()
      }
      val d2 = IndexMaintenance.maintainIfNeeded(spark, table,
        skewThresholdE6 = 2000000L, refresh = Some(rebalance))
      assert(d2.refreshed && hookRuns == 1,
        s"skew above threshold must trigger the hook: $d2")
      assert(d2.maxLoadE6 > 2000000L)
      val after = IndexMaintenance.maintainIfNeeded(spark, table,
        skewThresholdE6 = 2000000L, refresh = Some(rebalance))
      assert(!after.refreshed && hookRuns == 1 &&
        after.maxLoadE6 <= 2000000L,
        s"the refreshed index must measure balanced: $after")
      // detection without a wired cure still lands in the decision
      Bucketed.save((0 until 300).map(i => (1, 9000L + i))
        .toDF("centroid", "id"), table, Seq("centroid"), 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      val d3 = IndexMaintenance.maintainIfNeeded(spark, table,
        skewThresholdE6 = 2000000L)
      assert(d3.refreshNeeded && !d3.refreshed, s"$d3")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("maintainTableIfNeeded: a churned data table compacts, vacuums debris, stamps stats; a healthy one no-ops") {
    import org.apache.spark.sql.functions.col
    val table = "graft_idxmaint_datatbl"
    try {
      def rows(lo: Int, hi: Int) =
        (lo until hi).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
      // churn: three appends → 3 files per bucket; plant crash debris
      Bucketed.save(rows(0, 40).repartition(2, col("k")),
        table, Seq("k"), 2)
      Bucketed.setRetention(spark, table, 2)
      Bucketed.save(rows(40, 80).repartition(2, col("k")), table,
        Seq("k"), 2, mode = org.apache.spark.sql.SaveMode.Append)
      Bucketed.save(rows(80, 120).repartition(2, col("k")), table,
        Seq("k"), 2, mode = org.apache.spark.sql.SaveMode.Append)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val debris = new org.apache.hadoop.fs.Path(loc,
        "part-debris-00000_0.parquet")
      val o = fs.create(debris, true); o.write(Array[Byte](1)); o.close()
      val d = IndexMaintenance.maintainTableIfNeeded(spark, table,
        maxFilesPerBucket = 2, maxUnreferencedFiles = 0)
      assert(d.measuredMaxFilesPerBucket == 3 && d.compactedBuckets == 2,
        s"$d")
      assert(d.unreferencedFiles >= 1 && d.vacuumedFiles >= 1, s"$d")
      assert(!fs.exists(debris), "debris must be vacuumed")
      assert(d.stampedStats, "no sidecar existed — the pass stamps one")
      assert(Bucketed.load(spark, table).count() == 120,
        "maintenance must not change the data")
      // vacuum ran AT the table's retention: the previous generation
      // stays time-travel readable
      val gens = Bucketed.generations(spark, table)
      assert(gens.size == 2, s"retention-2 history must survive: $gens")
      assert(Bucketed.loadAsOf(spark, table, gens.head).count() > 0)
      // a healthy table no-ops on every signal — and the decision
      // scan opens zero footers (metadata + the already-current sidecar)
      FileStats.forgetCached()
      val before = FileStats.footerOpens.get()
      val d2 = IndexMaintenance.maintainTableIfNeeded(spark, table,
        maxFilesPerBucket = 2, maxUnreferencedFiles = 0)
      assert(d2 == IndexMaintenance.TableMaintenanceDecision(
        0, 0, 0, stampedStats = false, measuredMaxFilesPerBucket = 1,
        unreferencedFiles = 0,
        // the first pass's compaction committed AFTER its vacuum
        // stamped the maint marker — one commit on the cadence clock,
        // far under the bound
        commitsSinceVacuum = 1), s"$d2")
      assert(FileStats.footerOpens.get() == before,
        "the healthy decision scan must be metadata-only")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("history-driven policy: cadence vacuum honors the in-flight guard; pairLag trips the signal; history folds") {
    import org.apache.spark.sql.functions.col
    val table = "graft_idxmaint_policy"
    try {
      def rows(lo: Int, hi: Int) =
        (lo until hi).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
      Bucketed.save(rows(0, 40).repartition(2, col("k")),
        table, Seq("k"), 2)
      Bucketed.setRetention(spark, table, 2)
      // merge churn: each commit rewrites buckets, retiring the old
      // files IN PLACE — beyond-window debris the cadence collects
      for (i <- 0 until 6)
        Bucketed.mergeByKey(spark, table,
          rows(i * 5, (i + 1) * 5).withColumn("v", col("v") + 1))
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // commits reconcile their own debris, so plant some crash
      // debris AFTER the last commit — what a died writer leaves
      val debris = new org.apache.hadoop.fs.Path(loc,
        "part-policydebris-00000_0.parquet")
      val po = fs.create(debris, true)
      po.write(Array[Byte](1)); po.close()
      assert(Bucketed.describe(spark, table).unreferencedFiles > 0,
        "fixture: unreferenced debris must exist")
      // a TORN manifest newer than the head = possibly another
      // process's in-flight commit whose files are already renamed
      // in: the cadence-triggered vacuum must NOT sweep
      val head = Bucketed.currentGeneration(spark, table)
      val torn = new org.apache.hadoop.fs.Path(loc,
        s"_graft_manifest.${head + 1}")
      val o = fs.create(torn, true)
      o.write("graft-manifest-v1\npart-inflight".getBytes("UTF-8"))
      o.close()
      val d = IndexMaintenance.maintainTableIfNeeded(spark, table,
        maxFilesPerBucket = 99, maxUnreferencedFiles = 999999,
        vacuumEveryCommits = 5)
      assert(d.commitsSinceVacuum >= 5, s"$d")
      assert(d.vacuumedFiles == 0,
        s"sweep must skip while a possibly-in-flight commit exists: $d")
      assert(Bucketed.describe(spark, table).unreferencedFiles > 0,
        "the guarded sweep must leave the debris in place")
      // guard gone → the debris signal collects on the next pass
      // (the cadence marker already advanced — no thrash)
      fs.delete(torn, false)
      Bucketed.forgetVerified()
      val d2 = IndexMaintenance.maintainTableIfNeeded(spark, table,
        maxFilesPerBucket = 99, maxUnreferencedFiles = 0,
        vacuumEveryCommits = 999)
      assert(d2.commitsSinceVacuum < 5, s"marker must have advanced: $d2")
      assert(d2.vacuumedFiles > 0, s"$d2")
      assert(Bucketed.load(spark, table).count() == 40,
        "policy maintenance must never change the data")
      // a pair pointer lagging the head by >= 2 surfaces (never fixed:
      // only a caller that knows no batch is in flight may commitPair)
      Bucketed.writePairPointer(spark, table,
        Bucketed.currentGeneration(spark, table) - 2, 1L)
      val d3 = IndexMaintenance.maintainTableIfNeeded(spark, table,
        maxFilesPerBucket = 99, maxUnreferencedFiles = 999999,
        vacuumEveryCommits = 999)
      assert(d3.pairRefreshNeeded, s"$d3")
      // history folding rides the same pass
      val d4 = IndexMaintenance.maintainTableIfNeeded(spark, table,
        maxFilesPerBucket = 99, maxUnreferencedFiles = 999999,
        vacuumEveryCommits = 999, maxLooseHistory = 2)
      assert(d4.historyFolded > 0, s"$d4")
      assert(Bucketed.history(spark, table).count() >= 7,
        "folded history must stay complete")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("load profile plan: one partial-agg shuffle + broadcast fold, no window") {
    val table = "graft_idxmaint_plan_idx"
    try {
      Bucketed.save((0 until 100).map(i => (i % 5, i.toLong))
        .toDF("centroid", "id"), table, Seq("centroid"), 4)
      val df = IndexMaintenance.listLoadProfile(spark, table)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec"), s"unexpected window:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"),
        s"scalar fold must broadcast, not shuffle:\n$plan")
      assert(df.count() == 5)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
