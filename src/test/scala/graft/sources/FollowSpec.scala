package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Indexes as maintained views of governed tables
  * ([[IndexMaintenance.refreshFromSource]]): a corpus table churns
  * through append / mergeByKey update / keyed delete, the index is
  * maintained ONLY via refreshFromSource, and probes must be
  * indistinguishable from a fresh build on the final state — stats
  * (n_docs/avgdl) included, since scores depend on them. Kill-points
  * exercise the intent-scrub exactly-once protocol. */
class FollowSpec extends SparkSuite {
  import spark.implicits._

  private val FollowMagic = "graft-follow-v1"
  private val BookmarkName = "_graft_follow_src"
  private val IntentName = "_graft_follow_intent"

  private val vocab = Vector("spark", "join", "scan", "filter", "hash",
    "merge", "sort", "stream")

  private def textOf(i: Long): String =
    (0 to (i % 5).toInt).map(k => vocab(((i + k) % 8).toInt))
      .mkString(" ")

  private def corpusRows(n: Int): Seq[(Long, String)] =
    (0 until n).map(i => (i.toLong, textOf(i.toLong)))

  private val qterms = Seq(
    (1L, Seq("spark", "scan")), (2L, Seq("join", "merge", "sort")))

  private def bmProbe(name: String) =
    graft.text.IncrementalBm25.probe(spark,
        qterms.toDF("query_id", "terms"), name, k = 5)
      .select("query_id", "doc_id", "score_e6", "n_terms", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSet

  /** The churned corpus's FINAL state, derived from the same rows the
    * governed table was fed — the fresh-build reference. */
  private def finalDocs(n: Int) =
    corpusRows(n)
      .filter(_._1 % 9 != 0)
      .map { case (id, t) =>
        (id, if (id % 10 == 1) s"$t spark" else t)
      }
      .toDF("doc_id", "text")

  private def churn(src: String): Unit = {
    val docs = corpusRows(40).toDF("doc_id", "text")
    Bucketed.save(docs.filter(col("doc_id") % 4 === 0), src,
      Seq("doc_id"), 4, mode = org.apache.spark.sql.SaveMode.Append)
    Bucketed.mergeByKey(spark, src,
      docs.filter(col("doc_id") % 10 === 1)
        .select(col("doc_id"),
          concat(col("text"), lit(" spark")).as("text")))
    Bucketed.mergeByKey(spark, src,
      docs.filter(col("doc_id") % 9 === 0)
        .withColumn("del", lit(true)),
      deleteCol = Some("del"))
  }

  private def mkSource(src: String): Unit = {
    Bucketed.save(
      corpusRows(40).toDF("doc_id", "text")
        .filter(col("doc_id") % 4 =!= 0),
      src, Seq("doc_id"), 4)
    Bucketed.setRetention(spark, src, 10)
  }

  test("BM25 index follows append + update + delete churn to probe parity with a fresh build") {
    val src = "graft_fol_src"; val name = "graft_fol_bm"
    val fresh = "graft_fol_bmfresh"
    try {
      mkSource(src)
      graft.text.IncrementalBm25.createFromSource(spark, src, name,
        buckets = 4)
      assert(IndexMaintenance.followerBookmark(spark, s"${name}_postings")
        .contains(Bucketed.currentGeneration(spark, src)))
      churn(src)
      graft.text.IncrementalBm25.refreshFromSource(spark, src, name,
        buckets = 4)
      graft.text.IncrementalBm25.buildIndex(finalDocs(40), fresh,
        buckets = 4)
      assert(bmProbe(name) == bmProbe(fresh),
        "a followed index must probe identically to a fresh build " +
          "on the final corpus (scores carry n_docs/avgdl)")
      // caught up: a replayed refresh is a no-op, lag reads 0
      graft.text.IncrementalBm25.refreshFromSource(spark, src, name,
        buckets = 4)
      assert(bmProbe(name) == bmProbe(fresh))
      assert(IndexMaintenance.followerBookmark(spark, s"${name}_postings")
        .contains(Bucketed.currentGeneration(spark, src)))
      assert(IndexMaintenance.followerLag(spark, src,
        s"${name}_postings").contains(0L))
      // an unpropagated source commit shows as lag 1 (the monitoring
      // signal: refreshFromSource owed), and propagation clears it
      Bucketed.mergeByKey(spark, src,
        Seq((3L, "scan scan merge")).toDF("doc_id", "text"))
      assert(IndexMaintenance.followerLag(spark, src,
        s"${name}_postings").contains(1L))
      graft.text.IncrementalBm25.refreshFromSource(spark, src, name,
        buckets = 4)
      assert(IndexMaintenance.followerLag(spark, src,
        s"${name}_postings").contains(0L))
    } finally Seq(src, s"${name}_postings", s"${name}_stats",
      s"${fresh}_postings", s"${fresh}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("follower kill-point: crash between a pair's append and its bookmark heals via the intent scrub") {
    val src = "graft_fol_ksrc"; val name = "graft_fol_kbm"
    val fresh = "graft_fol_kbmfresh"
    val host = s"${name}_postings"
    try {
      mkSource(src)
      graft.text.IncrementalBm25.createFromSource(spark, src, name,
        buckets = 4)
      churn(src)
      graft.text.IncrementalBm25.refreshFromSource(spark, src, name,
        buckets = 4)
      // the reachable crash state: the LAST pair's append committed,
      // the bookmark write did not — on disk that is bookmark at the
      // pair's lower generation plus the pair's intent tag (the tag is
      // written before the append and cleared only after the walk)
      val gens = Bucketed.generations(spark, src)
      val (x, y) = (gens(gens.length - 2), gens.last)
      Follow.writeBookmark(spark, host, BookmarkName, FollowMagic, x)
      Follow.writeTag(spark, host, IntentName, FollowMagic, s"$x-$y")
      graft.text.IncrementalBm25.refreshFromSource(spark, src, name,
        buckets = 4)
      graft.text.IncrementalBm25.buildIndex(finalDocs(40), fresh,
        buckets = 4)
      assert(bmProbe(name) == bmProbe(fresh),
        "the scrub must remove the replayed pair's postings before " +
          "re-appending — duplicates would inflate tf/df and stats")
      // a STALE intent tag (crash between a bookmark write and the
      // walk-end tag clear) never matches a later pair: churn again
      // with the stale tag planted — steady path, still exact
      Follow.writeTag(spark, host, IntentName, FollowMagic, s"$x-$y")
      Bucketed.mergeByKey(spark, src,
        Seq((2L, "filter filter spark")).toDF("doc_id", "text"))
      graft.text.IncrementalBm25.refreshFromSource(spark, src, name,
        buckets = 4)
      val fresh2 = "graft_fol_kbmfresh2"
      try {
        graft.text.IncrementalBm25.buildIndex(
          finalDocs(40).withColumn("text",
            when(col("doc_id") === 2L, lit("filter filter spark"))
              .otherwise(col("text"))),
          fresh2, buckets = 4)
        assert(bmProbe(name) == bmProbe(fresh2))
      } finally Seq(s"${fresh2}_postings", s"${fresh2}_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    } finally Seq(src, host, s"${name}_stats",
      s"${fresh}_postings", s"${fresh}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("ANN index follows append + delete churn to probe parity with a fresh build") {
    val src = "graft_fol_vsrc"; val idx = "graft_fol_vidx"
    val fresh = "graft_fol_vfresh"
    val cents: Array[Array[Double]] = Array(
      Array(1, 0, 0, 0), Array(0, 1, 0, 0),
      Array(0, 0, 1, 0), Array(0, 0, 0, 1))
    def vec(i: Long): Array[Float] =
      Array.tabulate(4)(d => (((i * 7 + d * 3) % 11) - 5).toFloat)
    val rows = (0 until 30).map(i => (i.toLong, vec(i.toLong)))
    try {
      Bucketed.save(rows.filter(_._1 % 4 != 0).toDF("id", "vec"),
        src, Seq("id"), 4)
      Bucketed.setRetention(spark, src, 10)
      graft.sim.IncrementalAnn.createFromSource(spark, src, idx,
        buckets = 4, cents)
      Bucketed.save(rows.filter(_._1 % 4 == 0).toDF("id", "vec"),
        src, Seq("id"), 4, mode = org.apache.spark.sql.SaveMode.Append)
      Bucketed.mergeByKey(spark, src,
        rows.filter(_._1 % 6 == 0).toDF("id", "vec")
          .withColumn("del", lit(true)),
        deleteCol = Some("del"))
      graft.sim.IncrementalAnn.refreshFromSource(spark, src, idx,
        buckets = 4, cents)
      graft.sim.IncrementalAnn.buildIndex(
        rows.filter(_._1 % 6 != 0).toDF("id", "vec"), fresh,
        buckets = 4, cents)
      val queries = (100 until 103).map(i => (i.toLong, vec(i.toLong)))
        .toDF("id", "vec")
      def probeOf(t: String) =
        graft.sim.IncrementalAnn.probe(spark, queries, t, cents,
            k = 3, nProbe = 2)
          .select("query_id", "neighbor_id", "cos_e6", "rank")
          .as[(Long, Long, Long, Int)].collect().toSet
      assert(probeOf(idx) == probeOf(fresh))
      assert(IndexMaintenance.followerBookmark(spark, idx)
        .contains(Bucketed.currentGeneration(spark, src)))
    } finally Seq(src, idx, fresh)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("band index follows append + update + delete churn to probe parity with a fresh build") {
    val src = "graft_fol_dsrc"; val idx = "graft_fol_didx"
    val fresh = "graft_fol_dfresh"
    try {
      mkSource(src)
      graft.text.IncrementalDedup.createFromSource(spark, src, idx,
        buckets = 4)
      churn(src)
      graft.text.IncrementalDedup.refreshFromSource(spark, src, idx,
        buckets = 4)
      graft.text.IncrementalDedup.buildIndex(finalDocs(40), fresh,
        buckets = 4)
      val shard = Seq((900L, "spark join scan"), (901L, "merge sort"))
        .toDF("doc_id", "text")
      def cand(t: String) = graft.text.IncrementalDedup
        .probe(spark, shard, t)
        .select("new_doc", "corpus_doc").as[(Long, Long)].collect().toSet
      assert(cand(idx) == cand(fresh),
        "a followed band index must yield the fresh build's candidates" +
          " — deleted docs gone, updated docs re-banded")
      // caught up: a replayed refresh is a no-op
      graft.text.IncrementalDedup.refreshFromSource(spark, src, idx,
        buckets = 4)
      assert(cand(idx) == cand(fresh))
      assert(IndexMaintenance.followerBookmark(spark, idx)
        .contains(Bucketed.currentGeneration(spark, src)))
    } finally Seq(src, idx, fresh)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
