package graft.text

import org.apache.spark.sql.functions._

class CurationSpec extends graft.SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta", "a"),
    (2L, "alpha beta gamma delta", "a"),
    (3L, "epsilon zeta", "a"),
    (10L, "alpha beta gamma epsilon", "b"),
    (11L, "totally different words here", "b"),
    (20L, "", "c"))
    .toDF("doc_id", "text", "source")

  test("hashSample is a deterministic subset, stable across runs") {
    val s1 = Curation.hashSample(docs, "doc_id", "80").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Curation.hashSample(docs, "doc_id", "80").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(s1.subsetOf(Set(1L, 2L, 3L, 10L, 11L, 20L)))
    // ceil "ff..." keeps everything, "00" keeps nothing
    assert(Curation.hashSample(docs, "doc_id", "zz").count() == 6)
    assert(Curation.hashSample(docs, "doc_id", "00").count() == 0)
  }

  test("stratifiedSample keeps at most n per stratum, all strata present") {
    val s = Curation.stratifiedSample(docs, "source", "doc_id", 2)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == Map("a" -> 2, "b" -> 2, "c" -> 1))
  }

  test("packSequences: bins respect the per-shard running token count") {
    val packed = Curation.packSequences(docs, budget = 5L)
      .orderBy("source", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // shard a: 4,4,2 tokens -> starts 0,4,8 -> bins 0,0,1; offsets 0,4,3
    assert(packed.filter(_._2 == "a").map(t => (t._1, t._4, t._5)).toSeq
      == Seq((1L, 0L, 0L), (2L, 0L, 4L), (3L, 1L, 3L)))
    // shard b restarts at 0: starts 0,4
    assert(packed.filter(_._2 == "b").map(t => (t._4, t._5)).toSeq
      == Seq((0L, 0L), (0L, 4L)))
    // empty text still counts one token (split semantics: [""])
    assert(packed.filter(_._2 == "c").head._3 == 1L)
  }

  test("contamination: duplicated text is fully contaminated, novel text zero") {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val test_ = docs.filter(col("doc_id") % 10 === 0)
    val c = Curation.contamination(train, test_)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 10 shares shingles with 1/2 ("alpha beta gamma") but not all
    val (n10, hit10, pct10) = c(10L)
    assert(hit10 > 0 && hit10 < n10 && pct10 > 0 && pct10 < 10000)
    // doc 20 ("" -> one empty-word shingle) appears nowhere in train
    assert(c(20L)._2 == 0 && c(20L)._3 == 0)
  }

  test("tokenBudgetMixture: budget watermark, determinism, unknown domains dropped") {
    import spark.implicits._
    val d = (0L until 30L).map { i =>
      (i, if (i < 20) "a" else "b", "w " * 10 + "end") // 11 tokens/doc
    }.toDF("doc_id", "source", "text")
    val out = Curation.tokenBudgetMixture(d,
      Map("a" -> 30L, "c" -> 100L), domainCol = "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // budget 30 over 11-token docs: cum_before 0, 11, 22 all < 30 -> 3 docs
    // kept (the third straddles the boundary — watermark keeps it);
    // domain b has no budget row, domain c has no docs
    assert(out.length == 3 && out.forall(_._2 == "a"))
    assert(out.map(_._4).sorted.sameElements(Seq(0L, 11L, 22L)))
    val again = Curation.tokenBudgetMixture(d,
      Map("a" -> 30L, "c" -> 100L), domainCol = "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  test("chunkDocuments: overlap windows, short tail, single-short-doc") {
    import spark.implicits._
    val d = Seq((1L, (1 to 12).map(i => s"w$i").mkString(" ")),
      (2L, "only three words")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(d, chunkTokens = 5, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 -> windows of 5 with 2-word overlap, tail = 3 words
    assert(doc1.map(_._3).toSeq == Seq(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10 w11", "w10 w11 w12"))
    assert(doc1.map(_._4).toSeq == Seq(5L, 5L, 5L, 3L))
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._3 == "only three words" &&
      doc2.head._4 == 3L)
  }

  test("weightedSample: p=0 drops, p>=1 keeps, monotone in weight, deterministic") {
    assert(Curation.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Curation.weightedSample(docs, "doc_id", lit(1.0)).count() == 6)
    assert(Curation.weightedSample(docs, "doc_id", lit(1.5)).count() == 6)
    def ids(p: Double) = Curation.weightedSample(docs, "doc_id", lit(p))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // same id keeps its md5 draw: a higher probability can only ADD rows
    val lo = ids(0.3)
    val hi = ids(0.7)
    assert(lo.subsetOf(hi))
    assert(ids(0.3) == lo) // re-run identical
    // per-row weights: only rows whose own prob clears their draw stay
    val byLen = Curation.weightedSample(docs, "doc_id",
      least(lit(1.0), length(col("text")).cast("double") / lit(10.0)))
    assert(byLen.count() >= docs.filter(length(col("text")) >= 10).count())
  }

  test("bloomDecontaminate: no false negatives vs the exact join, fp bounded") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 10 === 0)
    val bloom = Curation.bloomDecontaminate(corpus, eval_, fpp = 0.001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // exact flags per corpus doc, via the contamination join reversed
    val exact = Curation.contamination(train = eval_, test = corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, exactHits) =>
      val (n, flagged, keep) = bloom(id)
      // Bloom can only over-flag, never miss
      assert(flagged >= exactHits, s"doc $id lost a true hit")
      assert(flagged <= n)
      assert(keep == (flagged < 1L))
    }
    // corpus docs 1,2 share the "alpha beta gamma" shingle with eval
    // doc 10 -> true contamination is caught and they are dropped
    assert(!bloom(1L)._3 && !bloom(2L)._3)
    // doc 11 is novel text -> with fpp 0.001 and 3 shingles, kept
    assert(bloom(11L)._3)
  }

  test("portableBloomDecontaminate: no false negatives, agrees with exact") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val eval_ = docs.filter(col("doc_id") % 10 === 0)
    val bloom = Curation.portableBloomDecontaminate(corpus, eval_)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val exact = Curation.contamination(train = eval_, test = corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, exactHits) =>
      val (n, flagged, keep) = bloom(id)
      assert(flagged >= exactHits, s"doc $id lost a true hit")
      assert(flagged <= n)
      assert(keep == (flagged < 1L))
    }
    // true contamination (docs 1,2 share a shingle with eval doc 10) is
    // caught; novel doc 11 survives at 2^20 bits / 4 hashes
    assert(!bloom(1L)._3 && !bloom(2L)._3)
    assert(bloom(11L)._3)
    // deterministic re-run, bit-for-bit
    val again = Curation.portableBloomDecontaminate(corpus, eval_)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(again == bloom)
  }

  test("portableBloomDecontaminate: empty eval keeps the whole corpus") {
    val corpus = docs.limit(4)
    val none = docs.filter(lit(false))
    val out = Curation.portableBloomDecontaminate(corpus, none)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(out.length == 4 && out.forall { case (f, k) => f == 0L && k })
  }

  test("lmScore: in-vocab mass, OOV counts, quantized probabilities exact") {
    val train = Seq((100L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    // total = 4 tokens: p(alpha)=floor(2e9/4)=500000000,
    // p(beta)=p(gamma)=floor(1e9/4)=250000000
    val corpus = Seq(
      (1L, "alpha beta zzz"), // 2 in-vocab + 1 oov
      (2L, "zzz yyy"),        // all oov
      (3L, "alpha alpha"))    // duplicates each count
      .toDF("doc_id", "text")
    val got = Curation.lmScore(corpus, train)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((3L, 1L, 750000000L)))
    assert(got(2L) == ((2L, 2L, 0L)))
    assert(got(3L) == ((2L, 0L, 1000000000L)))
  }

  test("lmScore: vocabSize cut keeps the most frequent tokens") {
    val train = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val corpus = Seq((2L, "aa bb cc")).toDF("doc_id", "text")
    // vocabSize=2 keeps aa (3) and bb (2); cc OOV. total stays 6.
    val r = Curation.lmScore(corpus, train, vocabSize = 2).collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L) // cc
    assert(r.getLong(3) == (3L * 1000000000L / 6L) + (2L * 1000000000L / 6L))
  }

  test("lmScoreBigram: conditional transition probabilities, OOV, short docs") {
    // train bigrams: (a b)x2, (b a)x1, (b c)x1 — contexts: a→* = 2, b→* = 2
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    // p(a b) = floor(2e9/2) = 1e9; p(b a) = p(b c) = floor(1e9/2) = 5e8
    val corpus = Seq(
      (1L, "a b c"),   // (a b)=1e9, (b c)=5e8
      (2L, "c a"),     // (c a) unseen → oov
      (3L, "solo"),    // 1 token → 0 bigrams
      (4L, "a b a b")) // (a b)+(b a)+(a b)
      .toDF("doc_id", "text")
    val got = Curation.lmScoreBigram(corpus, train)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((2L, 0L, 1500000000L)))
    assert(got(2L) == ((1L, 1L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L)))
    assert(got(4L) == ((3L, 0L, 2500000000L)))
  }

  test("lmScoreBigram: vocabSize cut is by count with lexicographic ties") {
    // bigrams: (x y)x3, (y x)x2, (y z)x1 — vocabSize=2 keeps (x y),(y x);
    // contexts keep FULL totals: y→* = 3 even though (y z) fell out
    val train = Seq((1L, "x y x y x y z")).toDF("doc_id", "text")
    val corpus = Seq((2L, "x y z")).toDF("doc_id", "text")
    val r = Curation.lmScoreBigram(corpus, train, vocabSize = 2).collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L) // (y z) cut from the model
    // p(x y) = floor(3e9/3) = 1e9 (context x→* = 3)
    assert(r.getLong(3) == 1000000000L)
  }

  test("perplexityBucket: integer mean, oov rate, head/middle/tail cut") {
    val train = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b c"),   // sum 1.5e9 over 2 in-model -> mean 7.5e8
      (2L, "c a"),     // all oov -> mean 0, oov 100%
      (3L, "solo"),    // no bigrams -> mean 0
      (4L, "a b a b")) // sum 2.5e9 over 3 -> mean 833333333
      .toDF("doc_id", "text")
    val got = Curation.perplexityBucket(corpus, train,
        headE9 = 800000000L, midE9 = 1L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mean_p_e9"), r.getAs[Long]("oov_e4"),
          r.getAs[String]("bucket"), r.getAs[Boolean]("keep"))).toMap
    assert(got(1L) == ((750000000L, 0L, "middle", true)))
    assert(got(2L) == ((0L, 10000L, "tail", false)))
    assert(got(3L) == ((0L, 0L, "tail", false)))
    assert(got(4L) == ((833333333L, 0L, "head", true)))
  }

  test("topNgrams: counts and lexicographic tie-break") {
    val top = Curation.topNgrams(docs, n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "alpha beta" and "beta gamma" appear 3x (docs 1,2,10)
    assert(top.take(2) == Seq(("alpha beta", 3L), ("beta gamma", 3L)))
    assert(top(2)._2 == 2L) // "gamma delta" from docs 1,2
    // docs shorter than n contribute nothing (no crash on empty text)
    assert(Curation.topNgrams(docs.filter(col("doc_id") === 20), 2, 5).count() == 0)
  }

  test("capPerGroup equals the window-rank reference, incl. split groups") {
    // 3 groups x 40 rows over 4 shuffle partitions: every group is
    // guaranteed to span range-partition boundaries, exercising the
    // cross-partition offset path
    val rows = for (g <- Seq("a", "b", "c"); i <- 0 until 40)
      yield (g.hashCode.toLong * 1000 + i, g)
    val df = rows.toDF("id", "grp")
    val capped = Curation.capPerGroup(df, "grp",
      Seq(md5(col("id").cast("string").cast("binary")), col("id")), cap = 7)
    val got = capped.select("id", "grp", "rank_in_group")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
    val want = df
      .withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= 7)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.size == 21)
    // under-cap groups keep everything, ranks stay 1..n
    val small = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp")
    val keptAll = Curation.capPerGroup(small, "grp", Seq(col("id")), cap = 10)
      .select("id", "rank_in_group")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptAll == Set((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("leakageSafeSplit: cluster-mates share a split, all splits land") {
    val clusters = (0L until 300L).map(i => (i, i % 60))
      .toDF("doc_id", "component")
    val out = Curation.leakageSafeSplit(clusters)
      .select("doc_id", "component", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every member of a component got the component's split
    val byComp = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byComp.values.forall(_.size == 1))
    // with 60 distinct components all three splits should appear, with
    // train the clear majority (~80%)
    val bySplit = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
    // deterministic
    val again = Curation.leakageSafeSplit(clusters)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.map(t => (t._1, t._3)).toSet)
  }
}
