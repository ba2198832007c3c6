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

  /** Triangle counting via DEGREE-ORIENTED wedge joins — the canonical
    * skew-bounded distributed graph-join: direct every undirected edge
    * from its lower-(degree, id) endpoint to the higher one, so every
    * out-degree is O(√m) no matter how big a hub's real degree is
    * (a hub's edges all point INTO it). Each triangle {x ≺ y ≺ z} under
    * that total order is then found exactly once: as the wedge (x→y,
    * x→z) at its minimum corner, closed by the oriented edge y→z.
    *
    * Plan shape: three equi-joins (two degree annotations, one wedge
    * self-join on the shared source, one closing-edge join) — never a
    * cross product; wedge volume is Σ outdeg² ≤ m·√(2m), the textbook
    * bound that makes this the 100 TB triangle algorithm. Returns one
    * row (n_edges, n_triangles); both counts ride the plan as 1-row
    * aggregates (broadcast cross of two scalars, no collect). */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .withColumn("__fwd",
        struct(col("du"), col("u")) < struct(col("dv"), col("v")))
      .select(
        when(col("__fwd"), col("u")).otherwise(col("v")).as("s"),
        when(col("__fwd"), col("v")).otherwise(col("u")).as("t"),
        when(col("__fwd"), col("dv")).otherwise(col("du")).as("td"))
    val wedges = oriented.select(col("s"), col("t").as("t1"), col("td").as("td1"))
      .join(oriented.select(col("s"), col("t").as("t2"), col("td").as("td2")),
        "s")
      .filter(struct(col("td1"), col("t1")) < struct(col("td2"), col("t2")))
      .select("t1", "t2")
    val closed = wedges
      .join(oriented.select(col("s").as("t1"), col("t").as("t2")),
        Seq("t1", "t2"), "left_semi")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }
}
