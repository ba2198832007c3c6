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
    * PageRank plan, parallel across nodes, never a cross product. The
    * out-degree-annotated edge list is computed once and persisted for
    * the rounds, then unpersisted before returning (safe: every round's
    * ranks are EAGERLY localCheckpointed, so the returned result no
    * longer references the cache). The per-round checkpoint also cuts
    * lineage — iterative self-joins otherwise stack a plan tree that
    * grows exponentially in the optimizer.
    *
    * Input: directed edge list (any two columns named by src/dstCol);
    * duplicate edges are collapsed. Output: (node, rank_e9). */
  def pageRank(edges: DataFrame, iterations: Int = 2,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = nodes.withColumn("rank_e9", lit(1000000000L))
      for (_ <- 1 to iterations) {
        val contribs = ed.join(ranks, col("src") === col("node"))
          .select(col("dst").as("node"),
            expr("rank_e9 div deg").as("__c"))
          .groupBy("node").agg(sum("__c").as("__s"))
        ranks = nodes.join(contribs, Seq("node"), "left_outer")
          .select(col("node"),
            (lit(150000000L) +
              expr("(85 * coalesce(__s, 0L)) div 100")).as("rank_e9"))
          .localCheckpoint(eager = true)
      }
      ranks
    } finally {
      ed.unpersist()
      nodes.unpersist()
    }
  }
}
