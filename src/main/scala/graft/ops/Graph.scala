package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames — PageRank as join+agg
  * rounds, the shape that runs on any Spark cluster without a graph
  * library dependency.
  */
object Graph {

  /** PageRank with INTEGER-quantized arithmetic: ranks are bigints
    * scaled by 1e9, per-edge contributions use integer division
    * (`rank div outdegree`), and the damping step is
    * `teleport_e9 + (dampPct · Σcontrib) div 100` — exact integer math
    * end-to-end, so results are bit-identical across engines,
    * partitionings, and aggregation orders (the q70 oracle replicates
    * every operation in SQL; a double-summed PageRank could never
    * hash-match). Ranks start at 1e9 per node; dangling mass is dropped
    * (nodes without out-edges contribute nothing — fine for relative
    * ranking, the usual use).
    *
    * Scale shape: one round = one equi-join of edges⋈ranks on `src` +
    * one partial-agg sum shuffled on `dst` — the standard distributed
    * PageRank plan, parallel across nodes, never a cross product.
    *
    * Lineage strategy by iteration count:
    *  - Few rounds (≤ 3, the common analytics setting): return ONE
    *    fully-lazy plan with zero jobs inside this function. The plan
    *    tree repeats the edge/node subtrees per round, but physical
    *    planning deduplicates them (ReuseExchange — the repeated
    *    distinct/agg shuffles are computed once per evaluation), so the
    *    caller pays a single job with no checkpoint materialization.
    *  - Many rounds: iterative self-joins stack a plan tree that grows
    *    exponentially in the optimizer, so EAGERLY localCheckpoint each
    *    intermediate round to cut lineage, reading the degree-annotated
    *    edges from a persisted cache. The LAST round stays lazy (its
    *    lineage is one checkpointed input deep); its edge/degree inputs
    *    are recomputed once at evaluation — two shuffles, amortized
    *    across the many checkpointed rounds saved.
    *
    * Input: directed edge list (any two columns named by src/dstCol);
    * duplicate edges are collapsed. Output: (node, rank_e9). */
  def pageRank(edges: DataFrame, iterations: Int = 2,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val edPlan = e.join(deg, "src")
    val nodesPlan = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()

    def round(ed: DataFrame, nodes: DataFrame, ranks: DataFrame): DataFrame = {
      val contribs = ed.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"),
          expr("rank_e9 div deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__s"))
      nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(150000000L) +
            expr("(85 * coalesce(__s, 0L)) div 100")).as("rank_e9"))
    }

    val init = nodesPlan.withColumn("rank_e9", lit(1000000000L))
    if (iterations <= 3) {
      (1 to iterations).foldLeft(init)((r, _) => round(edPlan, nodesPlan, r))
    } else {
      val ed = edPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = nodesPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        var ranks = init
        for (i <- 1 to iterations) {
          ranks = round(ed, nodes, ranks)
          if (i < iterations) ranks = ranks.localCheckpoint(eager = true)
        }
        ranks
      } finally {
        // Safe even though the last round still references ed/nodes:
        // unpersist only drops the cache, the plan recomputes.
        ed.unpersist()
        nodes.unpersist()
      }
    }
  }
}
