package graft.text

import graft.SparkSuite

/** Every cleaning stage must fire on a fixture that exercises it:
  * low-quality and non-English docs gated out, an exact duplicate
  * collapsed, a near-duplicate dropped, and the clean survivors kept. */
class CleanCorpusSpec extends SparkSuite {
  import spark.implicits._

  private val en = "the quick brown fox jumps over the lazy dog and then " +
    "the fox runs far away into the deep green forest with many tall trees " +
    "where it hides from the big angry farmer for the rest of the day. " +
    "It sleeps, it eats, it waits; the sun sets and the moon rises over the hill."

  test("gates, exact dedup, and near-dup removal each fire") {
    val docs = Seq(
      (1L, en),                                       // keeper
      (2L, en),                                       // exact dup of 1 -> dropped
      (3L, en + " Only one extra sentence differs here at the end."), // near-dup of 1 -> dropped
      (4L, "short"),                                  // low quality -> gated
      (5L, "de hond en de kat zijn in het huis met een " * 12 +
           "boom. En dan, het is niet een dag voor de zon."), // Dutch -> gated
      (6L, "a completely different english document about databases " +
           "and the ways that the systems shuffle, sort and join the rows " +
           "of the tables; it is long enough to pass the quality gate and " +
           "it shares no phrasing with the fox document at all, not once."))
      .toDF("doc_id", "text")
    val kept = CleanCorpus.clean(docs, minQualityE4 = 3000,
        langs = Seq("en"), jaccardThresholdE4 = 6000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 6L), s"kept=$kept")
  }

  test("thresholds are honored: jaccard 10000 only drops exact-shingle matches") {
    val docs = Seq((1L, en), (3L, en + " tail.")).toDF("doc_id", "text")
    val kept = CleanCorpus.clean(docs, minQualityE4 = 0,
        langs = Seq("en"), jaccardThresholdE4 = 10000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // near-dup but not identical -> both kept
  }
}
