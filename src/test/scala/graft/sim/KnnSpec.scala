package graft.sim

import org.apache.spark.sql.functions._

class KnnSpec extends graft.SparkSuite {
  import spark.implicits._

  // two planted clusters on orthogonal axes + one off-axis distractor
  private def labeled = Seq(
    (1L, Array(1.0, 0.0, 0.1), 0),
    (2L, Array(0.9, 0.1, 0.0), 0),
    (3L, Array(1.0, 0.2, 0.0), 0),
    (4L, Array(0.0, 1.0, 0.1), 1),
    (5L, Array(0.1, 0.9, 0.0), 1),
    (6L, Array(0.0, 1.0, 0.2), 1),
    (7L, Array(0.7, 0.7, 0.0), 2))
    .toDF("id", "vec", "label")

  private def queries = Seq(
    (100L, Array(0.95, 0.05, 0.0)), // x-axis -> label 0
    (101L, Array(0.05, 0.95, 0.0))) // y-axis -> label 1
    .toDF("id", "vec")

  test("majority label of the k nearest neighbors wins") {
    val got = Knn.classify(queries, labeled, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((100L, 0L, 3L), (101L, 1L, 3L)))
  }

  test("vote ties break to the smaller label, deterministically") {
    // k=4: 3 of the winning cluster + the distractor... force a real tie
    // with k=2 against a query equidistant-ish between clusters: take
    // the top-2 = one from each side by construction
    val mid = Seq((200L, Array(0.7, 0.7, 0.05))).toDF("id", "vec")
    val two = Seq(
      (1L, Array(1.0, 0.0, 0.0), 5),
      (2L, Array(0.0, 1.0, 0.0), 3)).toDF("id", "vec", "label")
    val r = Knn.classify(mid, two, k = 2).collect().head
    assert(r.getLong(1) == 3L) // 1 vote each -> smaller label
    assert(r.getLong(2) == 1L)
  }

  test("per-query output is exactly one row") {
    val n = Knn.classify(queries, labeled, k = 5)
      .groupBy("query_id").count().select(max("count")).as[Long].head()
    assert(n == 1L)
  }
}
