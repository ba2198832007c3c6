package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** File-level data skipping from parquet footer min/max: time-ordered
  * appends prune to the matching batches' files, pruning is
  * conservative (never changes the result, only the files read), an
  * all-null file is provably prunable, and a commit invalidates the
  * stats via the generation-keyed cache. */
class FileStatsSpec extends SparkSuite {
  import spark.implicits._

  private def slice(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong,
      java.sql.Date.valueOf(java.time.LocalDate.of(1994, 1, 1).plusDays(i)),
      f"s$i%04d", i.toLong * 3))
      .toDF("k", "d", "s", "v")

  private def mk(table: String): Unit = {
    // three commits, each covering a disjoint range of d/s/v — the
    // append-ordered layout footer stats prune on
    Bucketed.save(slice(0, 100), table, Seq("k"), 2)
    Bucketed.save(slice(100, 200), table, Seq("k"), 2,
      mode = org.apache.spark.sql.SaveMode.Append)
    Bucketed.save(slice(200, 300), table, Seq("k"), 2,
      mode = org.apache.spark.sql.SaveMode.Append)
  }

  test("date-range read prunes non-matching appends' files, result identical to full scan") {
    val table = "graft_stats_date"
    try {
      mk(table)
      val lo = java.time.LocalDate.of(1994, 1, 1).plusDays(220)
      val hi = java.time.LocalDate.of(1994, 1, 1).plusDays(260)
      val (kept, pruned) = FileStats.splitFiles(spark, table, "d",
        java.sql.Date.valueOf(lo), java.sql.Date.valueOf(hi))
      assert(pruned.nonEmpty, "first two appends' files must prune")
      assert(kept.nonEmpty)
      val got = FileStats.loadBetween(spark, table, "d",
          java.sql.Date.valueOf(lo), java.sql.Date.valueOf(hi))
        .select("k").as[Long].collect().toSet
      val want = Bucketed.load(spark, table)
        .filter(col("d").between(lit(java.sql.Date.valueOf(lo)),
          lit(java.sql.Date.valueOf(hi))))
        .select("k").as[Long].collect().toSet
      assert(got == want && want == (220L to 260L).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("string- and long-range reads prune and match the full scan") {
    val table = "graft_stats_str"
    try {
      mk(table)
      val (keptS, prunedS) =
        FileStats.splitFiles(spark, table, "s", "s0050", "s0060")
      assert(prunedS.nonEmpty && keptS.nonEmpty)
      val gotS = FileStats.loadBetween(spark, table, "s", "s0050", "s0060")
        .select("k").as[Long].collect().toSet
      assert(gotS == (50L to 60L).toSet)
      val (keptV, prunedV) =
        FileStats.splitFiles(spark, table, "v", 330L, 360L)
      assert(prunedV.nonEmpty && keptV.nonEmpty)
      val gotV = FileStats.loadBetween(spark, table, "v", 330L, 360L)
        .select("k").as[Long].collect().toSet
      assert(gotV == (110L to 120L).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("pruning on the hashed bucket key keeps the result correct (hash spreads ranges everywhere)") {
    val table = "graft_stats_hashkey"
    try {
      mk(table)
      val got = FileStats.loadBetween(spark, table, "k", 10L, 20L)
        .select("k").as[Long].collect().toSet
      assert(got == (10L to 20L).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("countWhere answers covered files from metadata and scans only the boundary") {
    val table = "graft_stats_count"
    try {
      mk(table) // three appends: v spans [0,300), [300,600), [600,900)
      // range [150, 750): append 1 partially covered (scan), append 2
      // fully covered (metadata), append 3 partially covered (scan)
      val r = FileStats.countWhere(spark, table, "v", 150L, 750L)
      assert(r.count == (50 until 251).size.toLong,
        s"v=3i in [150,750] → i in [50,250]: $r")
      assert(r.coveredFiles > 0, s"interior files must answer from metadata: $r")
      assert(r.scannedFiles < r.coveredFiles + r.prunedFiles,
        s"only the range boundary should scan: $r")
      // fully-pruned range: zero rows, zero scan
      val r2 = FileStats.countWhere(spark, table, "v", 5000L, 6000L)
      assert(r2.count == 0L && r2.coveredFiles == 0 &&
        r2.scannedFiles == 0 && r2.prunedFiles > 0, s"$r2")
      // whole-table range: all metadata, zero scan
      val r3 = FileStats.countWhere(spark, table, "v", 0L, 10000L)
      assert(r3.count == 300L && r3.scannedFiles == 0 && r3.coveredFiles > 0)
      // agreement with the real count, always
      assert(r.count == Bucketed.load(spark, table)
        .filter(col("v").between(150L, 750L)).count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("minMaxWhere answers from proven file bounds, scanning only admissible boundary files") {
    val table = "graft_stats_minmax"
    try {
      mk(table) // v = 3i over three appends
      // interior range: min/max attained in fully-covered files
      val (mn, mx) = FileStats.minMaxWhere(spark, table, "v", 150L, 750L)
      assert(mn.contains(150L) && mx.contains(750L), s"$mn $mx")
      // boundary-straddling odd range
      val (mn2, mx2) = FileStats.minMaxWhere(spark, table, "v", 151L, 749L)
      assert(mn2.contains(153L) && mx2.contains(747L), s"$mn2 $mx2")
      // empty range
      assert(FileStats.minMaxWhere(spark, table, "v", 5000L, 6000L)
        == (None, None))
      // agreement with the real aggregates
      val r = Bucketed.load(spark, table)
        .filter(col("v").between(150L, 750L))
        .agg(min("v"), max("v")).head()
      assert(mn.contains(r.getLong(0)) && mx.contains(r.getLong(1)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("an all-null file is provably prunable; a commit refreshes the stats") {
    val table = "graft_stats_null"
    try {
      Bucketed.save(slice(0, 50), table, Seq("k"), 2)
      Bucketed.save(
        (1000 until 1050).map(i => (i.toLong,
            null.asInstanceOf[java.sql.Date], s"t$i", i.toLong))
          .toDF("k", "d", "s", "v"),
        table, Seq("k"), 2, mode = org.apache.spark.sql.SaveMode.Append)
      val lo = java.sql.Date.valueOf("1994-01-10")
      val hi = java.sql.Date.valueOf("1994-01-20")
      val (_, pruned) = FileStats.splitFiles(spark, table, "d", lo, hi)
      assert(pruned.nonEmpty, "the all-null append must prune")
      assert(FileStats.loadBetween(spark, table, "d", lo, hi)
        .count() == 11)
      // a merge commit advances the generation → fresh stats: rows
      // moved into range must now be found
      Bucketed.mergeByKey(spark, table,
        Seq((1000L, java.sql.Date.valueOf("1994-01-15"), "t1000", 1000L))
          .toDF("k", "d", "s", "v"))
      assert(FileStats.loadBetween(spark, table, "d", lo, hi)
        .count() == 12)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
