package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Reciprocal-rank fusion: hand-computed contributions, tie order,
  * docs present in only one list, multi-query fusion through
  * query-partitioned windows only. */
class HybridSpec extends SparkSuite {
  import spark.implicits._

  test("rrf matches the hand-computed fusion; single-list docs score once") {
    // query 1: list A ranks docs 10,20,30; list B ranks 20,10,40
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 10L, 2), (1L, 40L, 3))
      .toDF("query_id", "doc_id", "rank")
    val got = Hybrid.rrf(Seq(a, b), Seq("query_id"), "doc_id", k = 10)
      .select("query_id", "doc_id", "rrf_e6", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    def c(r: Int) = 1000000L / (60 + r)
    // 10: r1+r2 = 16393+16129 = 32522; 20: r2+r1 = same 32522;
    // 30: r3 = 15873; 40: r3 = 15873 — ties break by doc_id
    assert(got == Set(
      (1L, 10L, c(1) + c(2), 1), (1L, 20L, c(2) + c(1), 2),
      (1L, 30L, c(3), 3), (1L, 40L, c(3), 4)), s"got $got")
  }

  test("multi-query fusion: every window is query-partitioned, top-k per query") {
    val a = (1 to 3).flatMap(q => (1 to 5).map(r =>
      (q.toLong, (q * 100 + r).toLong, r))).toDF("query_id", "doc_id", "rank")
    val b = (1 to 3).flatMap(q => (1 to 5).map(r =>
      (q.toLong, (q * 100 + 6 - r).toLong, r))).toDF("query_id", "doc_id", "rank")
    val df = Hybrid.rrf(Seq(a, b), Seq("query_id"), "doc_id", k = 2)
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("windowspecdefinition(query_id"),
        s"fusion window must partition by the query:\n$l")
    }
    val got = df.select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(got.length == 6 && got.groupBy(_._1).forall(_._2.length == 2))
    // symmetric lists: every doc's fused score within a query is the
    // pair {c(r), c(6-r)}; the top doc per query is rank-1-plus-rank-5
    // vs rank-3-twice etc. — just pin determinism across partitionings
    val again = Hybrid.rrf(
        Seq(a.repartition(7), b.repartition(3)),
        Seq("query_id"), "doc_id", k = 2)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(got.toSet == again.toSet)
  }

  test("rankCut ranks an already-cut list after the cut, never the corpus") {
    val cut = Seq((5L, 900L), (3L, 950L), (9L, 900L))
      .toDF("doc_id", "score_e6")
    val df = Hybrid.rankCut(cut, queryId = 42L,
      Seq(col("score_e6").desc, col("doc_id").asc))
    // the Opaque barrier must keep the constant partition key in the
    // PHYSICAL plan: a partition-less WindowExec here would re-open
    // the warning channel that masks real unpartitioned-window bugs
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("windowspecdefinition(query_id"),
        s"rankCut's window must keep its partition spec:\n$l")
    }
    val ranked = df.select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ranked == Set((42L, 3L, 1), (42L, 5L, 2), (42L, 9L, 3)))
  }
}
