package graft.text

class InvertedIndexSpec extends graft.SparkSuite {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark spark duck"),
      (2L, "spark duck duck duck"),
      (3L, "spark  SPARK goose")) // normalization folds case/whitespace
      .toDF("doc_id", "text")
  }

  test("postings carry exact in-doc term frequencies") {
    val p = InvertedIndex.postings(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p(("spark", 1L)) == 2L)
    assert(p(("spark", 2L)) == 1L)
    assert(p(("spark", 3L)) == 2L)
    assert(p(("duck", 2L)) == 3L)
    assert(p(("goose", 3L)) == 1L)
    assert(p.size == 6)
  }

  test("term stats: df, total_tf, argmax with smallest-doc tie break") {
    val s = InvertedIndex.termStats(InvertedIndex.postings(corpus))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(s("spark") == ((3L, 5L, 1L, 2L))) // tf=2 in docs 1 and 3 -> doc 1
    assert(s("duck") == ((2L, 4L, 2L, 3L)))
    assert(s("goose") == ((1L, 1L, 3L, 1L)))
  }

  test("minDf prunes the hapax tail") {
    val terms = InvertedIndex.termStats(InvertedIndex.postings(corpus),
        minDf = 2).collect().map(_.getString(0)).toSet
    assert(terms == Set("spark", "duck"))
  }

  test("tfidf: rare terms outweigh common ones, rank ties by term") {
    // "spark" in all 3 docs (idf = 3*1e6/3 = 1e6); "goose" only in doc 3
    // (idf = 3e6) -> goose outranks spark in doc 3 despite lower tf
    val r = InvertedIndex.tfidfTopK(corpus, k = 2).collect()
      .map(x => (x.getLong(0), x.getInt(5)) -> (x.getString(1), x.getLong(4)))
      .toMap
    assert(r((3L, 1)) == (("goose", 3000000L)))  // 1 * 3e6
    assert(r((3L, 2)) == (("spark", 2000000L)))  // 2 * 1e6
    // doc 2: duck tf=3 df=2 -> 3 * (3e6 div 2) = 4500000; spark 1e6
    assert(r((2L, 1)) == (("duck", 4500000L)))
    assert(r((2L, 2)) == (("spark", 1000000L)))
  }

  test("tfidf plan: window partitioned by doc, no global sort, N broadcast") {
    val plan = InvertedIndex.tfidfTopK(corpus, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global sort expected:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"), s"N should broadcast:\n$plan")
  }

  test("plan: two partial-agg shuffles, no window, no join") {
    val plan = InvertedIndex.termStats(InvertedIndex.postings(corpus))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"no window expected:\n$plan")
    assert(!plan.contains("Join"), s"no join expected:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <= 2 hash exchanges:\n$plan")
  }
}
