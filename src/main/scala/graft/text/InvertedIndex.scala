package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index materialization: the postings table (term -> documents
  * with term frequencies) that keyword retrieval ([[Bm25]]), fast
  * contamination probes, and corpus statistics all read. Materializing
  * it once (e.g. bucketed by term) amortizes the explode across every
  * downstream consumer — the standard preprocessing artifact of a
  * text corpus at scale.
  *
  * Scale shape: explode -> ONE hash shuffle on (term, doc) for the tf
  * agg (partial map-side combine first); term-level stats are a second
  * partial agg on term alone. The argmax doc per term travels as a
  * packed struct through the SAME agg (no extra join or window); no
  * stage materializes more than a term-partition. Write the result
  * `bucketBy(term)` and every future term lookup is a bucket-pruned
  * scan.
  */
object InvertedIndex {

  /** Postings: one row per (term, doc) with the in-doc term frequency.
    * Terms are whitespace tokens of the normalized text. */
  def postings(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    graft.sources.Tables.widen(
        docs.select(col(idCol).cast("long").as("doc_id"),
          TextAnalysis.wordsCol(col(textCol)).as("__ws")))
      .select(col("doc_id"), explode(col("__ws")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Term-level index statistics from a postings table: document
    * frequency, total term frequency, and the argmax posting (highest
    * tf, ties to the smallest doc_id) — packed struct max, so the whole
    * thing is one partial-aggregated shuffle on term. `minDf` prunes
    * the hapax tail (most of the vocabulary by row count). */
  def termStats(postings: DataFrame, minDf: Long = 1L): DataFrame =
    postings
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum("tf").as("total_tf"),
        max(struct(col("tf"), (-col("doc_id")).as("nd"))).as("__top"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("total_tf"),
        (-col("__top.nd")).as("top_doc_id"), col("__top.tf").as("top_tf"))
}
