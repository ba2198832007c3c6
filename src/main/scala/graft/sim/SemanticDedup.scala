package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column
  * (Abbas et al. 2023: cluster the embedding space, then drop
  * near-identical pairs WITHIN clusters): IVF k-means centroids act as
  * the blocking key, exact cosine pairs are scored inside blocks only,
  * and connected components + min-id representative turn pairs into a
  * keep/drop decision per document.
  *
  * Scale shape — every stage is an operator this library already runs
  * at bucket-local cost: centroid assignment is map-only against the
  * broadcast codebook; pair scoring shuffles on the centroid key and
  * never crosses blocks (|block|² bounded by the cluster granularity
  * you train, the SemDeDup trade: more centroids = cheaper pairs,
  * slightly lower recall at cluster borders); the component contraction
  * is O(log n) rounds of compact (id, id) edges.
  */
object SemanticDedup {

  /** Per-document verdicts: (id, component, kept). `kept = 1` marks the
    * smallest id of each near-duplicate group (singletons keep
    * themselves) — filtering on it IS the dedup. */
  def assignments(emb: DataFrame, thresholdE6: Long,
                  nCentroids: Int = 16, iters: Int = 2): DataFrame =
    assignmentsWith(emb, thresholdE6,
      Ivf.trainCentroids(emb, nCentroids, iters))

  /** [[assignments]] with an INJECTED codebook — the same blocking →
    * in-block pairs → components pipeline minus the training step.
    * With a pinned codebook ([[Pinned.ivfCentroids]]) every stage is
    * deterministic SQL arithmetic, which is what makes the q121
    * companion driver-checkable while trained q58 stays spec-gated. */
  def assignmentsWith(emb: DataFrame, thresholdE6: Long,
                      cents: Array[Array[Double]]): DataFrame = {
    // checkpoint: both sides of the in-block self-join read the
    // assignment table, and the typed assignment mapPartitions blocks
    // ReusedExchange (the Fuzzy/Bm25/dHashTable pattern) — without the
    // cut the corpus would be normalized + assigned once per side
    val blocked = emb.select(col("id"), col("vec"))
      .join(Ivf.assignments(emb, cents), Seq("id"))
      .localCheckpoint(eager = false)
    val pairs = Similarity
      .nearDupBlocked(blocked, "centroid", thresholdE6)
      .select(col("id_a"), col("id_b"))
    graft.text.Components.dedupClusters(
      emb.select(col("id")), pairs, idCol = "id")
  }

  /** The cleaned corpus: input rows whose id survived [[assignments]]. */
  def dedup(emb: DataFrame, thresholdE6: Long,
            nCentroids: Int = 16, iters: Int = 2): DataFrame =
    emb.join(
      assignments(emb, thresholdE6, nCentroids, iters)
        .filter(col("kept") === 1L).select("id"),
      Seq("id"), "left_semi")
}
