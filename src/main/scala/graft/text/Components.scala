package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup
  * endgame: MinHash/SimHash/embedding candidate PAIRS become duplicate
  * CLUSTERS, and "keep one document per cluster" becomes a single join.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed
  * as DataFrame aggregations:
  *
  *   - large-star: every node links its strictly-larger neighbors to
  *     the minimum of its neighborhood (incl. itself);
  *   - small-star: every node links its smaller neighbors (and itself)
  *     to the minimum of its smaller neighborhood.
  *
  * Each round is two groupBy-min passes + joins (hash shuffles on node
  * id); the edge set provably shrinks toward a forest of stars in
  * O(log n) rounds — unlike naive label propagation, whose round count
  * is the graph DIAMETER (a 1M-doc boilerplate chain would need 1M
  * rounds; large-star/small-star needs ~20). No step ever materializes
  * a component's member list in one task, so a 100M-member component is
  * as safe as a 2-member one.
  *
  * Convergence is detected by an (edge-count, hash-sum) checksum —
  * one tiny aggregate action per round. NOTE eager: like every
  * iterative fixed-point graph algorithm, this runs its rounds as jobs
  * at CALL time (each round's edge set is cached and the previous one
  * unpersisted); the returned assignment DataFrame is small (one row
  * per non-root node) and lazy.
  *
  * Output: (id, component) for every node appearing in `pairs`, where
  * component = the smallest node id reachable — callers left-join and
  * coalesce(component, id) to cover singleton documents.
  */
object Components {

  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  private def smallStar(edges: DataFrame): DataFrame = {
    // edges arrive oriented u > v; m = min of u's smaller-neighborhood
    val mins = edges.groupBy("u").agg(min("v").as("m"))
    val relink = edges.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    relink.union(mins.select(col("u"), col("m").as("v"))).distinct()
  }

  /** (count, sum of row hashes) — cheap fixed-point detector. The hash
    * sum aggregates as decimal(38,0): a long sum overflows ANSI
    * arithmetic after a few billion edges (or a handful of large
    * hashes). */
  private def checksum(edges: DataFrame): (Long, BigDecimal) = {
    val r = edges.agg(count(lit(1)),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val Seq(a, b) = pairs.columns.take(2).toSeq
    // localCheckpoint per round: each star pass references its input
    // ~6x, so WITHOUT lineage truncation the logical plan grows ~6^round
    // nodes and Catalyst re-analysis dominates by round 5 (caching alone
    // does not cut the *plan*). On a fault-tolerant cluster run, swap in
    // reliable checkpoint() + a checkpoint dir — same shape, same cost
    // profile (one materialization per round, which the convergence
    // check needs anyway).
    // LAZY checkpoint + checksum-as-materializer (round 15): each
    // round's edge set still materializes exactly once (the convergence
    // checksum is the action that computes it), but as ONE job instead
    // of the former two (eager checkpoint job, then a separate checksum
    // job over the cache) — per-round fixed job cost halves, same
    // rounds, same results. The lineage truncation the checkpoint
    // exists for is unchanged.
    var edges = pairs
      .select(col(a).cast("long").as("u"), col(b).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = false)
    var prev = checksum(edges)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val cur = checksum(next)
      edges.unpersist()
      edges = next
      converged = cur == prev
      prev = cur
      it += 1
    }
    // at the fixed point every edge is (node -> its component's min id)
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Per-document cluster assignment over the full corpus: singleton
    * docs become their own component; `kept = 1` marks the cluster
    * representative (smallest doc id) — filtering on it IS the
    * keep-one-per-cluster dedup. */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    // rename the assignment side so idCol = "id" callers don't collide
    val comps = connectedComponents(pairs)
      .select(col("id").as("__cc_id"), col("component"))
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comps, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("kept", (col("component") === col(idCol)).cast("long"))
  }
}
