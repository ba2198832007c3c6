package graft.sim

import org.apache.spark.sql.functions._

class SimilaritySpec extends graft.SparkSuite {

  private def corpus = {
    import spark.implicits._
    // deterministic pseudo-vectors, 64-dim like the testdata embeddings
    val rows = (0L until 200L).map { i =>
      val v = Array.tabulate(64)(d =>
        (graft.functions.Hashing.polyHash(s"$i:$d").toDouble
          / graft.functions.Hashing.P).toFloat)
      (i, v)
    }
    rows.toDF("id", "vec")
  }

  test("native graft_dot_e6 expression == scala math, handles length mismatch") {
    import spark.implicits._
    val a = Array(0.5, -0.25, 2.0)
    val b = Array(1.0, 4.0, 0.5, 9.9) // extra element ignored (min length)
    val df = Seq((a, b)).toDF("a", "b")
    val want = math.floor((0.5 * 1.0 + -0.25 * 4.0 + 2.0 * 0.5) * 1e6).toLong
    assert(df.select(graft.expressions.DotE6.col(col("a"), col("b")))
      .head().getLong(0) == want)
    // on a non-foldable input the expression appears in the plan (the
    // literal case above was constant-folded — interpreted eval works)
    val ranged = spark.range(10)
      .select(org.apache.spark.sql.functions.array(col("id").cast("double")).as("v"))
    val p = ranged
      .select(graft.expressions.DotE6.col(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_dot_e6"), p)
    assert(ranged.select(graft.expressions.DotE6.col(col("v"), col("v")))
      .collect().map(_.getLong(0)).sum == (0 until 10).map(i => i.toLong * i * 1000000L).sum)
  }

  test("dot/norm/cosine columns match scala math") {
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 2.0f)
    val b = Array(2.0f, 0.0f, 0.0f)
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      Similarity.dotCol(col("a").cast("array<double>"), col("b").cast("array<double>")),
      Similarity.normCol(col("a").cast("array<double>")),
      Similarity.cosineScaledCol(col("a").cast("array<double>"),
        col("b").cast("array<double>"))).collect().head
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(r.getLong(2) == math.floor(2.0 / (3.0 * 2.0) * 1e6).toLong)
  }

  test("brute-force top-k: self excluded, k rows per query, ranked desc") {
    val q = corpus.filter(col("id") < 3)
    val res = Similarity.bruteForceTopK(q, corpus, k = 5).collect()
    assert(res.length == 15)
    val byQuery = res.groupBy(_.getLong(0))
    byQuery.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(1)).distinct.length == 5)
      assert(!rows.map(_.getLong(1)).contains(qid))
      val cos = rows.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(cos.sameElements(cos.sortBy(-(_: Long))))
    }
  }

  test("LSH recall ≥ 0.6 vs brute force on pseudo-corpus (gate for q28)") {
    val q = corpus.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(q, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("lshTopKBroadcast rows are identical to lshTopK (shared bucket kernel)") {
    val q = corpus.filter(col("id") < 10)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
    val join = Similarity.lshTopK(q, corpus, k = 5).collect().map(key).toSet
    val bcast = Similarity.lshTopKBroadcast(q, corpus, k = 5).collect().map(key).toSet
    assert(join == bcast,
      s"only-join=${join -- bcast}, only-bcast=${bcast -- join}")
  }

  test("ivfTopK (broadcast probes) rows are identical to ivfTopKJoin") {
    val q = corpus.filter(col("id") < 10)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
    val fast = Ivf.ivfTopK(q, corpus, k = 5, nCentroids = 8, iters = 2)
      .collect().map(key).toSet
    val join = Ivf.ivfTopKJoin(q, corpus, k = 5, nCentroids = 8, iters = 2)
      .collect().map(key).toSet
    assert(fast == join, s"only-join=${join -- fast}, only-fast=${fast -- join}")
  }

  test("IVF: codebook is deterministic; assignments cover the corpus") {
    val cents1 = Ivf.trainCentroids(corpus, nCentroids = 8, iters = 2)
    val cents2 = Ivf.trainCentroids(corpus, nCentroids = 8, iters = 2)
    assert(cents1.length == 8)
    assert(cents1.zip(cents2).forall { case (a, b) => a.sameElements(b) })
    val assigned = Ivf.assignments(corpus, cents1)
    assert(assigned.count() == 200)
    val cids = assigned.select("centroid").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(cids.subsetOf((0 until 8).toSet) && cids.size > 1)
  }

  test("IVF recall ≥ 0.6 vs brute force on pseudo-corpus (gate for q41)") {
    val q = corpus.filter(col("id") < 10)
    val exact = Similarity.bruteForceTopK(q, corpus, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfTopK(q, corpus, k = 5,
        nCentroids = 8, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("IVF recall ≥ 0.9 on real embeddings sf0.001 (driver gate for q41)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("LSH recall ≥ 0.9 on real embeddings sf0.001 (driver gate)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }
}

class FlagshipSpec extends graft.SparkSuite {

  test("flagship E1 pipeline: >0 triples, linked bestand, dekking bnodes") {
    val t = graft.etl.Flagship.run(spark, "/root/testdata/sf0.001").cache()
    val n = t.count()
    assert(n > 0)
    val kinds = t.select("objectKind").distinct().collect()
      .map(_.getString(0)).toSet
    assert(kinds == Set("uri", "bnode", "literal"))
    // every record links to its bestand and back
    val fwd = t.filter(col("predicate") === (graft.rdf.NS.LDTO + "heeftRepresentatie")).count()
    val back = t.filter(col("predicate") === (graft.rdf.NS.LDTO + "isRepresentatieVan")).count()
    assert(fwd > 0 && fwd == back)
    // dekkingInTijd bnodes have their begin date
    val dek = t.filter(col("predicate") === (graft.rdf.NS.LDTO + "dekkingInTijd")).count()
    val begin = t.filter(col("predicate") === (graft.rdf.NS.LDTO + "begin")).count()
    assert(dek == begin && dek == fwd)
    t.unpersist()
  }
}

class NearDupSpec extends graft.SparkSuite {
  import org.apache.spark.sql.functions._

  test("blocked near-dup is exact within blocks; LSH path has recall ≥ 0.8") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val blocked = Similarity.nearDupBlocked(emb, "label", 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs with the same threshold (ignoring blocks) via a
    // single-block run = ground truth superset
    val allPairs = Similarity.nearDupBlocked(
        emb.withColumn("label", lit(1)), "label", 300000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(allPairs))
    if (allPairs.nonEmpty) {
      val lsh = Similarity.nearDupLsh(emb, 300000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(lsh.subsetOf(allPairs))
      val recall = (lsh & allPairs).size.toDouble / allPairs.size
      assert(recall >= 0.8, s"recall=$recall over ${allPairs.size} true pairs")
    }
  }
}
