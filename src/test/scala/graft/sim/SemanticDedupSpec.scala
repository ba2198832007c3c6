package graft.sim

import org.apache.spark.sql.functions._

class SemanticDedupSpec extends graft.SparkSuite {

  // 40 well-separated base vectors + exact copies of three of them.
  // NOTE: polyHash alone is NOT a mixer (nearby strings hash to nearby
  // values — raw polyHash/P grids are near-parallel), and all-POSITIVE
  // uniform components still crowd around cosine 0.75 with a tail past
  // 0.999 in 16 dims. LCG-scramble the hash AND center on zero: iid
  // uniform [-0.5, 0.5) components put pairwise cosines near 0, far
  // from the dedup threshold.
  private def corpus = {
    import spark.implicits._
    def base(i: Long) = Array.tabulate(16) { d =>
      val h = graft.functions.Hashing.polyHash(s"sd$i:$d") *
        6364136223846793005L + 1442695040888963407L
      ((h >>> 11).toDouble / (1L << 53).toDouble - 0.5).toFloat
    }
    val originals = (0L until 40L).map(i => (i, base(i)))
    val dups = Seq(100L -> base(3), 101L -> base(3), 102L -> base(7))
    (originals ++ dups).toDF("id", "vec")
  }

  test("planted duplicates collapse to the min id; distinct vectors survive") {
    val out = SemanticDedup.assignments(corpus, thresholdE6 = 999000L,
        nCentroids = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical vectors always share a centroid, so blocking cannot
    // separate them: {3,100,101} and {7,102} must merge
    assert(out(3L) == (3L, 1L) && out(100L) == (3L, 0L) && out(101L) == (3L, 0L))
    assert(out(7L) == (7L, 1L) && out(102L) == (7L, 0L))
    // pseudo-random 16-dim vectors are far below cosine 0.999 of each
    // other: every other doc keeps itself
    val others = out.view.filterKeys(k => !Set(3L, 7L, 100L, 101L, 102L)(k))
    assert(others.forall { case (k, (c, kept)) => c == k && kept == 1L })
  }

  test("dedup returns the survivors only, keyed by kept=1") {
    val cleaned = SemanticDedup.dedup(corpus, thresholdE6 = 999000L,
        nCentroids = 4, iters = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(cleaned.size == 40)
    assert(Set(100L, 101L, 102L).forall(!cleaned(_)))
    assert(cleaned(3L) && cleaned(7L))
  }
}
