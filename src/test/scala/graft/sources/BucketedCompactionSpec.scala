package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The append-per-batch maintenance contract: compaction bounds
  * per-bucket file counts on a continuously-appended index, preserves
  * the posting set (deduplicating replay double-appends), and keeps the
  * bucket-pruned, Exchange-free probe plans intact. */
class BucketedCompactionSpec extends SparkSuite {
  import spark.implicits._

  /** file count per bucket id, from the table dir the scan reads */
  private def filesPerBucket(table: String): Map[Int, Int] = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val dir = new org.apache.hadoop.fs.Path(meta.location)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .flatMap(f => """.*_(\d+)(?:\..*)?$""".r
        .findFirstMatchIn(f.getPath.getName).map(_.group(1).toInt))
      .groupBy(identity).map { case (b, fsOfB) => b -> fsOfB.size }
  }

  private def text(i: Int): String =
    (0 until 12).map(j => s"w${(i * 31 + j * 7) % 9973}x$i").mkString(" ")

  test("compaction bounds per-bucket files across 8 gate batches; plans and verdicts survive") {
    val table = "graft_compact_gate_idx"
    val buckets = 8
    try {
      val corpus = (0 until 40).map(i => (i.toLong, text(i)))
        .toDF("doc_id", "text")
      graft.text.IncrementalDedup.buildIndex(corpus, table, buckets)
      // 8 micro-batches: even batches re-send a corpus dup (dropped),
      // every batch carries one novel doc (kept + appended)
      for (b <- 0 until 8) {
        val batch = Seq(
          (1000L + b, text(600 + b)),
          (2000L + b, text(b * 3 % 40))).toDF("doc_id", "text")
        val kept = graft.text.IncrementalDedup.gateBatch(batch, table,
            buckets, "text", "doc_id", 3, 16, 4)
          .select("doc_id").as[Long].collect().toSet
        assert(kept == Set(1000L + b), s"batch $b kept $kept")
        if ((b + 1) % 2 == 0)
          Bucketed.compactBuckets(spark, table, maxFilesPerBucket = 2)
      }
      val counts = filesPerBucket(table)
      assert(counts.nonEmpty && counts.values.max <= 2,
        s"per-bucket file counts exceed the bound: $counts")
      // the probe plan properties the index is FOR survive compaction:
      // bucket pruning on a small shard, no index-side Exchange
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val one = Seq((9000L, text(600))).toDF("doc_id", "text")
        val probed = graft.text.IncrementalDedup.probe(spark, one, table)
        val plan = probed.queryExecution.executedPlan.toString
        val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
          .findFirstMatchIn(plan)
        assert(sel.isDefined, s"expected bucket pruning:\n$plan")
        assert(sel.get.group(1).toInt < buckets,
          s"expected pruned scan: ${sel.get.matched}")
        val full = graft.text.IncrementalDedup.probe(spark, one, table,
          pruneKeys = 0)
        val nEx = "(?<!Reused)Exchange".r
          .findAllIn(full.queryExecution.executedPlan.toString).size
        assert(nEx == 2, s"index side must stay Exchange-free, got $nEx")
        // the kept novel doc from batch 0 is still findable
        assert(probed.as[(Long, Long)].collect().toSet
          .contains((9000L, 1000L)))
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compaction preserves the posting set and dedups replay double-appends") {
    val table = "graft_compact_set_idx"
    try {
      val rows = (0 until 200).map(i => (s"k${i % 37}_$i", i.toLong))
        .toDF("bkey", "doc")
      Bucketed.save(rows, table, Seq("bkey"), buckets = 4)
      // an at-least-once replay: the same shard appended twice
      val shard = (200 until 230).map(i => (s"k${i % 37}_$i", i.toLong))
        .toDF("bkey", "doc")
      Bucketed.save(shard, table, Seq("bkey"), buckets = 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      Bucketed.save(shard, table, Seq("bkey"), buckets = 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      assert(Bucketed.load(spark, table).count() == 260)
      val n = Bucketed.compactBuckets(spark, table, maxFilesPerBucket = 1)
      assert(n > 0, "expected at least one bucket rewritten")
      val after = Bucketed.load(spark, table)
      // duplicates gone, set intact
      assert(after.count() == 230, s"got ${after.count()}")
      assert(after.as[(String, Long)].collect().toSet
        == (0 until 230).map(i => (s"k${i % 37}_$i", i.toLong)).toSet)
      assert(filesPerBucket(table).values.max == 1)
      // idempotent: nothing left over the bound
      assert(Bucketed.compactBuckets(spark, table, maxFilesPerBucket = 1) == 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ANN probe results are unchanged by compaction of an appended index") {
    val table = "graft_compact_ann_idx"
    val dim = 8
    val cents = graft.sim.Pinned.ivfCentroids(8, dim)
    def vecs(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, Array.tabulate(dim)(d =>
        math.sin(i * 0.37 + d).abs + 0.01)))
      .toDF("id", "vec")
    try {
      graft.sim.IncrementalAnn.buildIndex(vecs(0, 120), table, 4, cents)
      graft.sim.IncrementalAnn.appendToIndex(vecs(120, 160), table, 4, cents)
      graft.sim.IncrementalAnn.appendToIndex(vecs(160, 200), table, 4, cents)
      val q = vecs(500, 505)
      val before = graft.sim.IncrementalAnn
        .probe(spark, q, table, cents, k = 5)
        .as[(Long, Long, Long, Int)].collect().toSet
      val n = graft.sim.IncrementalAnn.compactIndex(spark, table,
        maxFilesPerBucket = 1)
      assert(n > 0)
      val afterCounts = filesPerBucket(table)
      assert(afterCounts.values.max == 1, s"$afterCounts")
      val after = graft.sim.IncrementalAnn
        .probe(spark, q, table, cents, k = 5)
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(after == before)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("single-maintenance-writer lock: concurrent op fails fast, failed op releases, nothing persists a crash") {
    val table = "graft_compact_lock_idx"
    try {
      (0 until 50).map(i => (s"k$i", i.toLong)).toDF("bkey", "doc")
        .createOrReplaceTempView("lock_rows")
      Bucketed.save(spark.table("lock_rows"), table, Seq("bkey"), 4)
      Bucketed.save(spark.table("lock_rows"), table, Seq("bkey"), 4,
        mode = org.apache.spark.sql.SaveMode.Append)
      // a maintenance writer in ANOTHER thread holds the table's lock:
      // this thread's op must fail fast and leave the table untouched
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      val lock = Bucketed.maintenanceLockFor(meta.location.toString)
      val held = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val holder = new Thread(() => {
        lock.lock()
        try { held.countDown(); release.await() }
        finally lock.unlock()
      })
      holder.start()
      held.await()
      val filesBefore = filesPerBucket(table)
      val e = intercept[IllegalStateException] {
        Bucketed.compactBuckets(spark, table, maxFilesPerBucket = 1)
      }
      assert(e.getMessage.contains("maintenance already in flight"))
      assert(filesPerBucket(table) == filesBefore,
        "a lock-rejected op must not touch the table")
      release.countDown()
      holder.join()
      // after the holder finishes, the op proceeds — and a FAILING op
      // releases the lock too (the crash analogue: nothing persists,
      // so the gates' self-healing replay can never be bricked)
      intercept[RuntimeException] {
        Bucketed.rewriteBuckets(spark, table, Set(0, 1, 2, 3),
          _ => throw new RuntimeException("boom"))
      }
      assert(Bucketed.compactBuckets(spark, table, maxFilesPerBucket = 1) > 0)
      assert(filesPerBucket(table).values.max == 1)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
