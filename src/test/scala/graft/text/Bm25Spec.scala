package graft.text

class Bm25Spec extends graft.SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join spark join spark"),   // tf(spark)=3 tf(join)=2, dl=5
    (2L, "spark filter scan table scan"),  // tf(spark)=1, dl=5
    (3L, "window window window window window"), // tf(window)=5, dl=5
    (4L, "merge sort hash"),               // no hits, dl=3
    (5L, "join"))                          // tf(join)=1, dl=1
    .toDF("doc_id", "text")

  test("hand-computed BM25 arithmetic (odds-idf, k1=1.2 b=0.75)") {
    val out = Bm25.topK(docs, Seq("spark", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // N=5, totTok=19, avgdl=3.8
    // df(spark)=2 -> idf_e6 = floor((5-2+0.5)/(2+0.5)*1e6) = 1400000
    // df(join)=2  -> idf_e6 = 1400000
    val avgdl = 19.0 / 5.0
    def w(idf: Long, tf: Long, dl: Long): Long =
      math.floor(idf.toDouble * (tf.toDouble * 2.2) /
        (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))).toLong
    val d1 = w(1400000, 3, 5) + w(1400000, 2, 5)
    val d2 = w(1400000, 1, 5)
    val d5 = w(1400000, 1, 1)
    assert(out(1L) == (d1, 2L))
    assert(out(2L) == (d2, 1L))
    assert(out(5L) == (d5, 1L))
    assert(!out.contains(4L)) // no query terms -> absent
    assert(!out.contains(3L))
  }

  test("ranking prefers more matched terms and shorter docs") {
    val top = Bm25.topK(docs, Seq("spark", "join"), k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(top.head == 1L)            // two terms, high tf
    assert(top.indexOf(5L) < top.indexOf(2L)) // same tf, shorter doc wins
  }

  test("k bounds the output and empty-match corpora return no rows") {
    assert(Bm25.topK(docs, Seq("spark", "join"), k = 2).count() == 2)
    assert(Bm25.topK(docs, Seq("zzz"), k = 5).count() == 0)
  }

  test("topKBatch equals per-query topK; one corpus scan set serves the whole batch") {
    val qs = Seq(
      (10L, Seq("spark", "join")),
      (20L, Seq("window")),
      (30L, Seq("scan", "table", "scan"))) // duplicate term must not double-weight
    val batch = Bm25.topKBatch(docs, qs.toDF("query_id", "terms"), k = 10)
    val got = batch
      .select("query_id", "doc_id", "score_e6", "n_terms", "rank")
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    val expected = qs.flatMap { case (qid, terms) =>
      Bm25.topK(docs, terms, k = 10)
        .as[(Long, Long, Long)].collect().toSeq.zipWithIndex
        .map { case ((doc, s, n), i) => (qid, doc, s, n, i + 1) }
    }.toSet
    assert(got == expected && got.nonEmpty)
    // batch contract: the corpus is scanned per TABLE, not per query —
    // the outer plan reads only the checkpointed dl/tf/qt tables (each
    // materialized with one scan of its own), and the per-query top-k
    // is ONE window, so adding queries adds broadcast rows, not jobs
    val p = batch.queryExecution.executedPlan.toString
    assert(!p.contains("FileScan") && !p.contains("LocalTableScan"),
      s"outer plan should read checkpoints only:\n$p")
    assert("\\+- Window \\[".r.findAllIn(p).size == 1,
      s"expected one query-partitioned top-k window:\n$p")
    // a query id split across input rows (and repeating a term across
    // them) behaves like its merged DISTINCT term set — not a
    // double-weighted union
    val split = Seq((7L, Seq("spark")), (7L, Seq("spark", "join")))
      .toDF("query_id", "terms")
    val merged = Bm25.topKBatch(docs, split, k = 10)
      .select("doc_id", "score_e6", "n_terms")
      .as[(Long, Long, Long)].collect().toSet
    val direct = Bm25.topK(docs, Seq("spark", "join"), k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == direct,
      s"split-row query diverged: $merged vs $direct")
  }

  test("reuse variant matches the lazy plan exactly; outer plan reads checkpoints") {
    val terms = Seq("spark", "join")
    val a = Bm25.topK(docs, terms, k = 10).collect().map(_.toSeq).toSeq
    val b = Bm25.topK(docs, terms, k = 10, reuseTables = false)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // the scoring plan itself never rescans the corpus — both shared
    // tables arrive as checkpointed RDDs (each materialized with ONE
    // corpus scan of its own; 2 total instead of 4)
    val p = Bm25.topK(docs, terms, k = 10).queryExecution.executedPlan.toString
    assert(!p.contains("FileScan") && !p.contains("LocalTableScan"),
      s"outer plan should read checkpoints only:\n$p")
  }
}
