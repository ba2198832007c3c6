package graft.text

import org.apache.spark.sql.functions._

class TrainingDataSpec extends graft.SparkSuite {
  import spark.implicits._

  // quality gate needs >= ~15 english-ish tokens; near-dups need high
  // 2-shingle jaccard; eval contamination needs 8-word verbatim overlap
  private val longText =
    "the quick brown fox jumps over the lazy dog and then the " +
      "small bird flies over the tall tree in the green field"

  private def corpus = Seq(
    (1L, longText),                                    // survives
    (2L, longText),                                    // exact dup of 1 -> dropped
    (3L, longText + " extra"),                         // near-dup of 1 -> clustered, dropped
    (4L, "short low"),                                 // fails quality gate
    (5L, "a completely different story where many people walk through " +
      "the old town square and watch the warm evening light slowly fall " +
      "on the quiet water"),
    (6L, "this document copies the evaluation passage word for word " +
      "because it leaked into the crawl and must be removed from training " +
      "data by the decontamination stage right here"))
    .toDF("doc_id", "text")

  private def evalSet = Seq(
    (100L, "because it leaked into the crawl and must be removed from " +
      "training data by the decontamination stage"))
    .toDF("doc_id", "text")

  private def run() = TrainingData.prepare(corpus, evalSet,
      maxContamE4 = 2000, maxBucket = 0)
    .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    .toMap

  test("each stage drops what it should; survivors carry cluster + split + bin") {
    val out = run()
    assert(out.contains(1L), "clean unique doc must survive")
    assert(out.contains(5L), "clean unique doc must survive")
    assert(!out.contains(2L), "exact duplicate must be dropped")
    assert(!out.contains(3L), "near-duplicate (non-representative) must be dropped")
    assert(!out.contains(4L), "low-quality doc must fail the gate")
    assert(!out.contains(6L), "eval-contaminated doc must be dropped")
    // representative of the 1/2/3 cluster is the min doc id
    assert(out(1L)._1 == 1L)
  }

  test("packing: bins are per split and offsets stay under the budget") {
    val out = run()
    out.values.foreach { case (_, split, nTokens, bin, offset) =>
      assert(Seq("train", "val", "test").contains(split))
      assert(offset >= 0 && offset < 512)
      assert(bin >= 0 && nTokens > 0)
    }
  }

  test("split assignment is a pure function of the component") {
    val out = run()
    // doc 1's split must equal leakageSafeSplit's decision for component 1
    val expected = Curation.leakageSafeSplit(
        Seq((1L, 1L)).toDF("doc_id", "component"))
      .collect().head.getAs[String]("split")
    assert(out(1L)._2 == expected)
  }

  test("skew-capped run (complete pairs) equals the uncapped run") {
    // maxBucket = 1 forces EVERY band bucket through the
    // triangle-distributed complete-pairs path; since that path emits
    // the exact uncapped pair set, the whole pipeline output must be
    // identical to the maxBucket = 0 run — this is the production
    // default branch (q108's oracle only exercises maxBucket = 0)
    val capped = TrainingData.prepare(corpus, evalSet,
        maxContamE4 = 2000, maxBucket = 1)
      .collect().map(_.toSeq).toSet
    val uncapped = TrainingData.prepare(corpus, evalSet,
        maxContamE4 = 2000, maxBucket = 0)
      .collect().map(_.toSeq).toSet
    assert(capped == uncapped)
  }

  test("no eval set: nothing is decontaminated, near-dup logic unchanged") {
    val out = TrainingData.prepare(corpus,
        evalSet.filter(lit(false)), maxBucket = 0)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 5L, 6L)) // doc 6 survives without an eval index
  }
}
