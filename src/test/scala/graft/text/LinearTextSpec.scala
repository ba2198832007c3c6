package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.functions.Hashing

/** Hashed-linear classifier serving gates (q124 companion). */
class LinearTextSpec extends SparkSuite {
  import spark.implicits._

  test("score equals the hand-computed gram weight sum; empty doc scores bias") {
    val w = LinearText.pinnedWeightsE6(m = 64)
    val docs = Seq((1L, "alpha beta"), (2L, "   ")).toDF("doc_id", "text")
    val got = LinearText.scoreHashed(docs, w, biasE6 = 7L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    val expected = 7L +
      w(LinearText.bucket("alpha", 64)) +
      w(LinearText.bucket("beta", 64)) +
      w(LinearText.bucket("alpha beta", 64))
    assert(got(1L) == ((2L, expected, expected >= 0L)))
    assert(got(2L) == ((0L, 7L, true)))
  }

  test("pinned weights are in [-1000, 1000] and spread over both signs") {
    val w = LinearText.pinnedWeightsE6()
    assert(w.length == 4096)
    assert(w.forall(x => x >= -1000L && x <= 1000L))
    assert(w.exists(_ < 0) && w.exists(_ > 0))
  }

  test("bucket is the shared squareMix scatter") {
    assert(LinearText.bucket("tok", 4096) ==
      (Hashing.squareMix(Hashing.polyHash("tok")) % 4096).toInt)
  }

  test("scoring is map-only: no key shuffle, no join in the plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = LinearText.scoreHashed(docs, LinearText.pinnedWeightsE6())
      .queryExecution.executedPlan.toString
    // widen's round-robin spread of an under-parallel scan is allowed;
    // any KEYED exchange or join would mean the scorer stopped being a
    // broadcast-model map pass
    assert(!p.contains("Exchange hashpartitioning") &&
           !p.contains("Exchange rangepartitioning") &&
           !p.contains("Join"),
      s"classifier serving must be map-only:\n$p")
  }
}
