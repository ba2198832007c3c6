package graft.text

import org.apache.spark.sql.functions._
import graft.functions.Hashing

class DedupSpec extends graft.SparkSuite {

  private def docsDF = {
    import spark.implicits._
    Seq(
      (0L, "The quick brown fox jumps over the lazy dog"),
      (1L, "the  quick   Brown fox jumps over the lazy dog"), // normalizes to #0
      (2L, "a completely different document about spark engines"),
      (3L, "The quick brown fox jumps over the lazy cat"), // near-dup of #0
      (4L, "a completely different document about spark engines")) // exact dup of #2
      .toDF("doc_id", "text")
  }

  test("exact dedup keeps first per normalized hash") {
    val kept = Dedup.exact(docsDF).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L))
  }

  test("polyHash column == scala (ASCII)") {
    import spark.implicits._
    val inputs = Seq("hello", "the quick brown fox", "", "a")
    val got = inputs.toDF("s").select(Hashing.polyHashCol(col("s"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == inputs.map(Hashing.polyHash))
  }

  test("xxhash64String == xxhash64 column") {
    import spark.implicits._
    val inputs = Seq("hello", "wereld", "", "ünïcode ok")
    val got = inputs.toDF("s").select(xxhash64(col("s"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == inputs.map(Dedup.xxhash64String))
  }

  test("shingle hashes: rolling window fold, short-doc fallback") {
    val wh = Array(5L, 7L, 11L)
    val sh = Dedup.shingleHashes(wh, 2)
    assert(sh.toSeq == Seq((5 * 31 + 7L) % Hashing.P, (7 * 31 + 11L) % Hashing.P))
    // n < k → one partial window
    assert(Dedup.shingleHashes(Array(5L), 3).toSeq == Seq(5L))
  }

  test("minhash signature is permutation-invariant min") {
    val sh = Array(100L, 200L, 300L)
    val sig = Dedup.minhashSig(sh, 4)
    (0 until 4).foreach { j =>
      assert(sig(j) == sh.map(h => Hashing.reseed(h, j)).min)
    }
  }

  test("minhash LSH finds the near-dup pair, not the distinct pair") {
    val pairs = Dedup.minhashCandidatePairs(docsDF, k = 3, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical after normalization
    assert(pairs.contains((2L, 4L))) // exact dup
    assert(pairs.contains((0L, 3L)) || pairs.contains((1L, 3L))) // near-dup
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("skew guard: mega-buckets degrade to star pairs, cost stays linear") {
    import spark.implicits._
    // 60 identical boilerplate docs -> every band hashes all 60 into one
    // bucket; uncapped that is C(60,2)=1770 pairs, capped it is the 59
    // star pairs to the smallest id. Two distinct docs keep exact
    // semantics alongside.
    val boiler = (0L until 60L).map(i => (i, "common boilerplate header text"))
    val rest = Seq((100L, "some unique document body"),
      (101L, "some unique document body")) // small bucket: all-pairs kept
    val docs = (boiler ++ rest).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidatePairs(docs, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val starPairs = (1L until 60L).map(i => (0L, i)).toSet
    assert(capped.intersect(starPairs) == starPairs,
      "every mega-bucket member must stay connected to the representative")
    assert(capped.contains((100L, 101L)), "small buckets keep exact pairs")
    // bounded: 59 star pairs + the one small-bucket pair, not 1770
    assert(capped.size == 60, s"got ${capped.size} pairs")
    // default cap (1000) leaves these small fixtures at exact semantics
    val exact = Dedup.minhashCandidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size == 60 * 59 / 2 + 1)
  }

  test("triangle path: mega-bucket pairs are COMPLETE with bounded tasks") {
    import spark.implicits._
    // same skewed fixture: 60 identical docs = one mega bucket per band.
    // The triangle-distributed path must emit the full C(60,2) pair set
    // (star only guarantees connectivity) while each (gi,gj) task sees at
    // most 2*maxBucket members.
    val boiler = (0L until 60L).map(i => (i, "common boilerplate header text"))
    val rest = Seq((100L, "some unique document body"),
      (101L, "some unique document body"))
    val docs = (boiler ++ rest).toDF("doc_id", "text")
    val complete = Dedup.minhashCandidatePairsComplete(docs, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      i <- 0L until 60L; j <- (i + 1) until 60L
    } yield (i, j)).toSet + ((100L, 101L))
    assert(complete == expected,
      s"missing=${(expected -- complete).take(5)} extra=${(complete -- expected).take(5)}")
    // and it agrees with the uncapped star-path implementation exactly
    val uncapped = Dedup.minhashCandidatePairs(docs, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(complete == uncapped)
  }

  test("simhash: identical docs equal; near-dups within small hamming") {
    val sh = Dedup.simhash(docsDF, bits = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(sh(2L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) <= 16)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) >
      java.lang.Long.bitCount(sh(0L) ^ sh(3L)))
  }

  test("ngram jaccard: identical=10000, near-dup high, distinct zero-ish") {
    import spark.implicits._
    val pairs = Seq((0L, 1L), (0L, 3L), (0L, 2L)).toDF("doc_a", "doc_b")
    val j = Dedup.ngramJaccardScaled(docsDF, pairs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(j((0L, 1L)) == 10000L)
    assert(j((0L, 3L)) > 5000L)
    assert(!j.contains((0L, 2L))) // no shared shingles → dropped by inner join
  }
}

class TextAnalysisSpec extends graft.SparkSuite {

  test("language ID picks the marker-heavy language") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog is of the house"),
      (2L, "der Hund und die Katze ist das Haus und der Mann"),
      (3L, "de man en de vrouw van het huis en een hond"),
      (4L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langIdCol(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "nl")
    assert(got(4L) == "und")
  }

  test("token counts: whitespace and BPE-ish") {
    import spark.implicits._
    val df = Seq("Hello, world! 42 tokens?").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCountCol(col("text")),
      TextAnalysis.bpeTokenCountCol(col("text"))).collect().head
    assert(r.getInt(0) == 4)
    // Hello , world ! 42 tokens ? → 7
    assert(r.getInt(1) == 7)
  }

  test("punct ratio and quality are scaled integers") {
    import spark.implicits._
    val df = Seq("abcde.").toDF("text")
    val r = df.select(
      TextAnalysis.punctRatioScaledCol(col("text")),
      TextAnalysis.qualityScoreScaledCol(col("text"))).collect().head
    assert(r.getLong(0) == 1666L) // 1/6 chars
    assert(r.getLong(1) >= 0L && r.getLong(1) <= 10000L)
  }

  test("stopword hits count whole words incl. adjacent repeats") {
    import spark.implicits._
    val df = Seq("the the theater then the").toDF("text")
    val r = df.select(TextAnalysis.stopwordHitsCol(col("text"), Seq("the")))
      .collect().head
    assert(r.getLong(0) == 3L)
  }
}

/** The compiled stats path must replicate the Column-expression versions
  * operation-for-operation (both are oracle-checked arithmetic). */
class StatsParitySpec extends graft.SparkSuite {
  test("compiled stats == Column-expression stats") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox, jumps! Over the lazy dog."),
      (2L, "  der Hund   und die Katze ist das Haus  "),
      (3L, ""),
      (4L, "een;twee;drie de het en van een ja nee 123 !?"),
      (5L, "x")).toDF("doc_id", "text")
    val t = col("text")
    val colStats = docs.select(
      col("doc_id"),
      TextAnalysis.tokenCountCol(t).cast("long").as("n_tokens"),
      TextAnalysis.bpeTokenCountCol(t).cast("long").as("n_bpe_tokens"),
      TextAnalysis.punctRatioScaledCol(t).as("punct_ratio_e4"),
      TextAnalysis.meanWordLenScaledCol(t).as("mean_word_len_e4"),
      TextAnalysis.qualityScoreScaledCol(t).as("quality_e4"),
      TextAnalysis.langIdCol(t).as("lang_pred"),
      TextAnalysis.fingerprintCol(t).as("fingerprint"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val compiled = TextAnalysis.stats(docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(compiled == colStats)
  }
}

/** Native PolyHash expression: SQL registration + codegen verification. */
class PolyHashExprSpec extends graft.SparkSuite {
  test("graft_polyhash usable from SQL via extension injection") {
    import graft.expressions.PolyHash
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_polyhash", (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(es.head), "built-in")
    val r = spark.sql("SELECT graft_polyhash('hello') AS h").head().getLong(0)
    assert(r == Hashing.polyHash("hello"))
    // type check rejects non-strings
    val err = intercept[Exception](spark.sql("SELECT graft_polyhash(42)").collect())
    assert(err.getMessage.contains("string") || err.getMessage.contains("DATATYPE"))
  }

  test("containment: subset doc is fully contained, superset is not") {
    import spark.implicits._
    // A's 2-shingles are a strict subset of B's
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containmentScaled(d, pairs, k = 2).collect().head
    val (nInter, contA, contB) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nInter == 2L)            // (alpha,beta), (beta,gamma)
    assert(contA == 1000000L)       // all of A's shingles inside B
    assert(contB == 2L * 1000000L / 4L) // B has 4 shingles, 2 shared
  }

  test("containment: disjoint pairs are absent (no zero rows)") {
    import spark.implicits._
    val d = Seq((1L, "aa bb cc"), (2L, "xx yy zz")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    assert(Dedup.containmentScaled(d, pairs, k = 2).count() == 0L)
  }

  test("line dedup: lines in >= minDocs docs are excised, order preserved") {
    import spark.implicits._
    val boiler = "subscribe now"
    val d = Seq(
      (1L, s"unique one\n$boiler\ntail one"),
      (2L, s"$boiler\nunique two"),
      (3L, s"unique three\n$boiler"),
      (4L, "twice only\nunique four"),
      (5L, "twice only\nunique five")).toDF("doc_id", "text")
    val r = Dedup.removeRepeatedLines(d, minDocs = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == ((3L, 1L, "unique one\ntail one"))) // middle line cut, order kept
    assert(r(2L) == ((2L, 1L, "unique two")))
    assert(r(3L) == ((2L, 1L, "unique three")))
    // "twice only" appears in 2 docs < minDocs -> survives
    assert(r(4L) == ((2L, 0L, "twice only\nunique four")))
    assert(r(5L) == ((2L, 0L, "twice only\nunique five")))
  }

  test("line dedup: doc of only boilerplate collapses to empty text") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam line"), (2L, "spam line"), (3L, "spam line"),
      (4L, "real content")).toDF("doc_id", "text")
    val r = Dedup.removeRepeatedLines(d, minDocs = 3)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(1L) == "" && r(2L) == "" && r(3L) == "")
    assert(r(4L) == "real content")
  }

  test("line dedup plan: no window, count shuffle carries hashes not text") {
    import spark.implicits._
    val d = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = Dedup.removeRepeatedLines(d).queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"no window expected:\n$plan")
  }

  test("PolyHash participates in whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(100)
      .select(Hashing.polyHashCol(concat(lit("doc"), col("id").cast("string"))).as("h"))
      .groupBy().sum("h")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the projection holding graft_polyhash must be inside a codegen stage
    val projLine = p.linesIterator.find(_.contains("graft_polyhash"))
      .orElse(p.linesIterator.find(_.contains("Project"))).get
    assert(projLine.replaceAll("^[:\\s+\\-]*", "").startsWith("*"), p)
  }
}
