package graft.text

import org.apache.spark.sql.functions._

class ComponentsSpec extends graft.SparkSuite {

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components + transitive chain resolve to their min ids") {
    // {1,2,3,7} via chain 7-3-1-2, {10,11} separate
    val m = comps(Seq((7L, 3L), (3L, 1L), (1L, 2L), (10L, 11L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("long chain converges in O(log n) rounds, not diameter rounds") {
    // a 200-node path: naive label propagation would need ~200 rounds;
    // maxIter=25 only succeeds if the star contraction is doing its job
    val edges = (1L until 200L).map(i => (i, i + 1))
    val m = comps(edges)
    assert(m.size == 200 && m.values.forall(_ == 1L))
  }

  test("self loops and duplicate/reversed edges are harmless; empty input -> empty") {
    val m = comps(Seq((5L, 5L), (4L, 6L), (6L, 4L), (4L, 6L)))
    assert(m == Map(4L -> 4L, 6L -> 4L))
    assert(comps(Seq.empty).isEmpty)
  }

  test("dedupClusters: singletons keep themselves; one representative per cluster") {
    import spark.implicits._
    val docs = (0L to 6L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 3L), (3L, 5L), (2L, 6L)).toDF("doc_a", "doc_b")
    val out = Components.dedupClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (0L, 0L, 1L), (1L, 1L, 1L), (2L, 2L, 1L), (3L, 1L, 0L),
      (4L, 4L, 1L), (5L, 1L, 0L), (6L, 2L, 0L)))
    // keep-one-per-cluster = filter kept=1: exactly the 4 cluster minima
    // plus singletons
    assert(out.count(_._3 == 1L) == 4)
  }

  test("star caps on candidate pairs preserve component structure") {
    // a 6-member "mega bucket": all-pairs vs star both connect the set
    val all = for { i <- 0L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val star = (1L to 5L).map(j => (0L, j))
    assert(comps(all) == comps(star))
  }
}
