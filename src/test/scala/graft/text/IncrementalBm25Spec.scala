package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Incremental BM25 index: a probe from the persisted postings must be
  * bit-identical to Bm25.topKBatch over the raw corpus, stay identical
  * through append/delete/compaction (stats maintained incrementally),
  * and touch nothing but the term-pruned postings buckets. */
class IncrementalBm25Spec extends SparkSuite {
  import spark.implicits._

  private val name = "graft_incbm25_idx"
  private val buckets = 8

  // heavy term overlap: vocabulary t0..t16, 10 tokens per doc
  private def docs(lo: Int, hi: Int) = (lo until hi).map { i =>
    (i.toLong, (0 until 10).map(j => s"t${(i + j * 3) % 17}").mkString(" "))
  }.toDF("doc_id", "text")

  private def queries = Seq(
    (1L, Seq("t0", "t3", "t7")),
    (2L, Seq("t1")),
    (3L, Seq("t4", "t16", "t4"))).toDF("query_id", "terms")

  private def probeSet(): Set[(Long, Long, Long, Long, Int)] =
    IncrementalBm25.probe(spark, queries, name, k = 10)
      .select("query_id", "doc_id", "score_e6", "n_terms", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSet

  private def batchSet(corpus: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long, Long, Int)] =
    Bm25.topKBatch(corpus, queries, k = 10)
      .select("query_id", "doc_id", "score_e6", "n_terms", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSet

  private def drop(): Unit =
    Seq(s"${name}_postings", s"${name}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("probe equals the corpus-scan batch scorer through build/append/delete/compaction") {
    try {
      // 1. fresh build
      IncrementalBm25.buildIndex(docs(0, 40), name, buckets)
      assert(probeSet() == batchSet(docs(0, 40)) && probeSet().nonEmpty)
      // 2. append shifts df AND avgdl — scores of OLD docs change too,
      // so parity here proves the stats row really advanced
      IncrementalBm25.appendToIndex(docs(40, 55), name, buckets)
      val afterAppend = docs(0, 55)
      assert(probeSet() == batchSet(afterAppend))
      // 3. content-derived deletion retreats df and avgdl
      IncrementalBm25.deleteFromIndex(
        afterAppend.filter(col("doc_id") % 5 === 0), name, buckets)
      val afterDelete = afterAppend.filter(col("doc_id") % 5 =!= 0)
      assert(probeSet() == batchSet(afterDelete))
      // 4. compaction is verdict-neutral (and heals nothing here)
      val before = probeSet()
      IncrementalBm25.compactIndex(spark, name, maxFilesPerBucket = 1)
      assert(probeSet() == before)
    } finally drop()
  }

  test("duplicated erasure rows subtract once; repairStats heals the cross-table window") {
    try {
      IncrementalBm25.buildIndex(docs(0, 40), name, buckets)
      // an erasure batch re-sends doc 5 twice: the postings anti-join
      // is naturally idempotent (ids.distinct) and the stats retreat —
      // an accumulator — must be deduped the same way
      val dupBatch = docs(5, 6).unionByName(docs(5, 6))
        .unionByName(docs(10, 11))
      IncrementalBm25.deleteFromIndex(dupBatch, name, buckets)
      val remaining = docs(0, 40)
        .filter(!col("doc_id").isin(5, 10))
      assert(probeSet() == batchSet(remaining))
      // the documented cross-table window: an uncertain RETRY of a
      // completed delete finds no postings to remove but subtracts the
      // stats delta again — N shifts, every idf shifts, probes diverge
      IncrementalBm25.deleteFromIndex(docs(10, 11), name, buckets)
      assert(probeSet() != batchSet(remaining),
        "the retry window should shift scores (documented)")
      // healing: one postings scan recomputes the stats row
      val (n, tot) = IncrementalBm25.repairStats(spark, name)
      assert(n == 38, s"repaired n_docs $n")
      assert(tot > 0)
      assert(probeSet() == batchSet(remaining))
    } finally drop()
  }

  test("append-replay duplicate postings heal at compaction") {
    try {
      IncrementalBm25.buildIndex(docs(0, 30), name, buckets)
      // the same shard appended twice — at-least-once replay; the
      // duplicated rows inflate per-doc multiplicity and df (the
      // documented window) until compaction restores the posting SET.
      // (The stats row advances twice — the at-least-once cost the
      // caller's replay contract absorbs: only foreachBatch's
      // same-batch redelivery is in-contract, and the gates overwrite
      // per batch id rather than re-calling append.)
      IncrementalBm25.appendToIndex(docs(30, 35), name, buckets)
      IncrementalBm25.appendToIndex(docs(30, 35), name, buckets)
      assert(IncrementalBm25.compactIndex(spark, name,
        maxFilesPerBucket = 1) > 0)
      val healedPostings = graft.sources.Bucketed
        .load(spark, s"${name}_postings").count()
      val expected = docs(0, 35)
        .select(col("doc_id"),
          explode(TextAnalysis.wordsCol(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").count().count()
      assert(healedPostings == expected,
        s"posting set not healed: $healedPostings vs $expected")
    } finally drop()
  }

  test("probe plan: term-pruned postings scan, no corpus read, one window") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      IncrementalBm25.buildIndex(docs(0, 60), name, buckets)
      val probed = IncrementalBm25.probe(spark, queries, name, k = 5)
      val plan = probed.queryExecution.executedPlan.toString
      // the postings scan materializes inside the probe's lazy
      // checkpoint, so the OUTER plan must read checkpoints only —
      // in particular, no corpus file is ever scanned — with ONE
      // query-partitioned top-k window
      assert(!plan.contains("FileScan"),
        s"probe must not read any table outside its checkpointed scan:\n$plan")
      assert("(?m)^\\s*(?:\\+-)?\\s*Window \\[".r.findAllIn(plan).size == 1,
        s"expected one query-partitioned top-k window:\n$plan")
      assert(probed.count() > 0)
      // and the scan the checkpoint materializes — same construction
      // as the probe's — carries the term set in PushedFilters, so
      // row-group min/max skipping over the tok-SORTED files cuts the
      // read (whole-bucket pruning doesn't apply: no downstream
      // operator uses the bucketing in a broadcast-joined serving
      // plan, and Spark's planner then disables the bucketed scan)
      val scanPlan = graft.sources.Bucketed
        .load(spark, s"${name}_postings")
        .filter(col("tok").isin(
          Seq("t0", "t1", "t3", "t4", "t7", "t16"): _*))
        .queryExecution.executedPlan.toString
      assert("PushedFilters: \\[In\\(tok, ".r.findFirstIn(scanPlan).isDefined,
        s"expected the term set in PushedFilters:\n$scanPlan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      drop()
    }
  }
}
