package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN majority-vote label classification over the embeddings table —
  * the embedding-space auto-labeling / quality-classifier step of a
  * curation pipeline (label a held-out or unlabeled slice from its
  * nearest labeled neighbors, DataComp/fastText-classifier style, but
  * with the label source being the corpus itself).
  */
object Knn {

  /** Classify each query vector by the majority label of its `k`
    * nearest labeled neighbors (exact cosine, quantized cos_e6 ranking
    * with neighbor-id tie break — the same contract as
    * [[Similarity.bruteForceTopK]] / q27). Vote ties break to the
    * smaller label, so predictions are deterministic.
    *
    * Inputs: `queries` (id, vec); `labeled` (id, vec, label). Output:
    * (query_id, pred_label, n_votes).
    *
    * Scale shape: neighbor generation is the serving-path single corpus
    * scan (small query set broadcast — swap in lshTopKBroadcast /
    * Ivf.ivfTopK for a huge corpus, same downstream); the |queries|·k
    * neighbor table then BROADCASTS against the labeled table to pick up
    * labels — one more corpus scan, zero corpus shuffle — and the vote
    * is a partial-agg groupBy on the tiny (query, label) table. */
  def classify(queries: DataFrame, labeled: DataFrame, k: Int): DataFrame = {
    val nn = Similarity.bruteForceTopK(queries, labeled.select("id", "vec"), k)
    val votes = labeled
      .select(col("id").as("neighbor_id"), col("label").cast("long").as("label"))
      .join(broadcast(nn.select("query_id", "neighbor_id")), "neighbor_id")
      .groupBy("query_id", "label").agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_votes").desc, col("label").asc)
    votes.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1).drop("__r")
      .select(col("query_id"), col("label").as("pred_label"), col("n_votes"))
  }
}
