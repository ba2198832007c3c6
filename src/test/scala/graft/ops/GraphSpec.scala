package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the integer-quantized PageRank: hand-computed ranks on a tiny
  * graph, duplicate-edge collapse, dangling-node behavior, and the
  * iteration-count plumbing (eager localCheckpoint must still yield the
  * right values). */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 (the classic 3-node example)
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    .toDF("src", "dst")

  test("pageRank: one round matches hand-computed integer arithmetic") {
    // deg: 1->2, 2->1, 3->1; ranks start at 1e9
    // contribs: node2 = 1e9 div 2 = 500000000 (from 1)
    //           node3 = 1e9 div 2 + 1e9 div 1 = 1500000000
    //           node1 = 1e9 div 1 = 1000000000 (from 3)
    // rank(n) = 150000000 + (85 * c) div 100
    val got = Graph.pageRank(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 150000000L + 85L * 1000000000L / 100L)
    assert(got(2L) == 150000000L + 85L * 500000000L / 100L)
    assert(got(3L) == 150000000L + 85L * 1500000000L / 100L)
  }

  test("pageRank: duplicate edges collapse; two rounds chain round one") {
    val dup = edges.union(edges) // duplicates must not double contributions
    val r1 = Graph.pageRank(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 2 by hand from r1
    val c2 = Map(
      1L -> r1(3L) / 1L,
      2L -> r1(1L) / 2L,
      3L -> (r1(1L) / 2L + r1(2L) / 1L))
    val want = c2.map { case (n, c) => n -> (150000000L + 85L * c / 100L) }
    val got = Graph.pageRank(dup, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("pageRank: sink node keeps teleport-only rank, all nodes present") {
    // 1 -> 2 only: node 1 gets no in-links -> teleport only; node 2 sinks
    val g = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(g, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == 150000000L) // no inbound contributions
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long) = {
    val r = Graph.triangleCount(edges.toDF("src", "dst")).collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("triangleCount: K4 has 4 triangles, square has 0, diagonal adds 2") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(k4) == ((6L, 4L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tri(square) == ((4L, 0L)))
    assert(tri(square :+ ((1L, 3L))) == ((5L, 2L)))
  }

  test("triangleCount: direction, duplicates, and self-loops are normalized") {
    // same K3 expressed with reversed, duplicated, and self-loop edges
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(tri(messy) == ((3L, 1L)))
  }

  test("triangleCount: hub star has no triangles (orientation caps out-degree)") {
    // 1000-leaf star: the hub's edges all point INTO it after degree
    // orientation, so no wedge forms at the hub and the count is 0
    val star = (2L to 1001L).map(i => (1L, i))
    assert(tri(star) == ((1000L, 0L)))
  }
}
