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
    * Lineage strategy: the degree-annotated edges and node set are
    * persisted for the rounds; intermediate rounds stay LAZY up to a
    * lineage budget (`checkpointEvery` rounds — iterative self-joins
    * otherwise stack a plan tree that grows exponentially in the
    * optimizer), and ONE eager localCheckpoint materializes the final
    * ranks while those caches are hot, after which they unpersist. So
    * the whole computation runs exactly one job per lineage cut (one
    * total for the common ≤`checkpointEvery` case), each input subtree
    * is computed once from cache — NOT once per round reference (the
    * repeated-subtree plan re-scans the source per reference; exchange
    * reuse does not collapse them under AQE) — and the returned
    * DataFrame is a flat checkpoint read, cheap for callers to compose.
    *
    * Input: directed edge list (any two columns named by src/dstCol);
    * duplicate edges are collapsed. Output: (node, rank_e9). */
  def pageRank(edges: DataFrame, iterations: Int = 2,
               srcCol: String = "src", dstCol: String = "dst",
               checkpointEvery: Int = 4): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // hash-partition the big cached inputs ON THEIR JOIN KEYS: cached
    // plans report their outputPartitioning, so every round's edges⋈ranks
    // join (and the nodes⋈contribs fill) co-locates against the cache and
    // shuffles only the SMALL per-round side — the edge table crosses the
    // wire once total, not once per round. (Broadcasting ranks instead
    // would be faster here but wrong at scale: ranks = every node.)
    val ed = e.join(deg, "src").repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def round(ranks: DataFrame): DataFrame = {
      val contribs = ed.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"),
          expr("rank_e9 div deg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__s"))
      nodes.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(150000000L) +
            expr("(85 * coalesce(__s, 0L)) div 100")).as("rank_e9"))
    }

    try {
      var ranks = nodes.withColumn("rank_e9", lit(1000000000L))
      for (i <- 1 to iterations) {
        ranks = round(ranks)
        // cut lineage at the budget and ALWAYS materialize the final
        // round (so the caches below are still populated when it runs)
        if (i % checkpointEvery == 0 || i == iterations)
          ranks = ranks.localCheckpoint(eager = true)
      }
      ranks
    } finally {
      ed.unpersist()
      nodes.unpersist()
    }
  }
}
