package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Exact-substring span dedup (SpanDedup): seed-and-cover semantics,
  * alignment independence, and edge cases the q91/q92 oracles exercise
  * only statistically. */
class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private val boiler = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens

  // the shared 8-token passage sits at a DIFFERENT offset in each doc
  private def corpus() = Seq(
    (0L, s"one two three $boiler"),
    (1L, s"$boiler four five"),
    (2L, s"six seven eight nine ten eleven $boiler twelve"),
    (3L, "plain doc with no shared passage at all here"),
    (4L, "short doc")
  ).toDF("doc_id", "text")

  test("sliding grams are alignment-independent: planted span found at any offset") {
    val grams = SpanDedup.slidingGrams(corpus(), k = 8)
    val hits = grams.filter(col("gram") === boiler)
      .select("doc").as[Long].collect().sorted
    assert(hits.toSeq == Seq(0L, 1L, 2L))
  }

  test("docs shorter than k emit no grams and survive removal untouched") {
    val grams = SpanDedup.slidingGrams(corpus(), k = 8)
    assert(grams.filter(col("doc") === 4L).count() == 0)
    val out = SpanDedup.removeRepeatedSpans(corpus(), k = 8, minDocs = 3)
      .filter(col("doc_id") === 4L).as[(Long, String, Long)].head()
    assert(out == ((4L, "short doc", 0L)))
  }

  test("removal excises exactly the covered positions, reassembled in order") {
    val out = SpanDedup.removeRepeatedSpans(corpus(), k = 8, minDocs = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, "one two three", 8L),
      (1L, "four five", 8L),
      (2L, "six seven eight nine ten eleven twelve", 8L),
      (3L, "plain doc with no shared passage at all here", 0L),
      (4L, "short doc", 0L)))
  }

  test("a doc that is ENTIRELY a flagged span comes back empty, not missing") {
    val d = (corpus().as[(Long, String)].collect().toSeq :+ ((5L, boiler)))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(d, k = 8, minDocs = 3)
    assert(out.count() == 6)
    val r5 = out.filter(col("doc_id") === 5L).as[(Long, String, Long)].head()
    assert(r5 == ((5L, "", 8L)))
  }

  test("minDocs gates flagging: df=3 passage removed, df=2 passage kept") {
    val two = Seq(
      (0L, s"x $boiler"),
      (1L, s"y $boiler z"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(two, k = 8, minDocs = 3)
    assert(out.filter(col("n_removed") > 0).count() == 0)
  }

  test("sharedSpanPairs counts distinct shared grams per pair") {
    // docs 0,1,2 share the single gram `boiler`; doc 3/4 share nothing
    val pairs = SpanDedup.sharedSpanPairs(corpus(), k = 8, maxDf = 200)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(pairs == Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L)))
  }

  test("df cap drops viral grams from pairing") {
    val pairs = SpanDedup.sharedSpanPairs(corpus(), k = 8, maxDf = 2)
    assert(pairs.count() == 0) // boiler has df=3 > cap
  }

  test("within-doc repeated gram counts once toward a pair") {
    val d = Seq(
      (0L, s"$boiler and again $boiler"),
      (1L, s"intro $boiler outro words")).toDF("doc_id", "text")
    val pairs = SpanDedup.sharedSpanPairs(d, k = 8, maxDf = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((0L, 1L, 1L)))
  }
}
