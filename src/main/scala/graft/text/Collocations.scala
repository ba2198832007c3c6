package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining: word pairs that co-occur far more often than
  * their unigram frequencies predict — multi-word expressions ("new
  * york"), tokenizer-merge candidates, and phrase features. The classic
  * score is pointwise mutual information; this implementation ranks by
  * the equivalent LIFT ratio p(w1,w2) / (p(w1)p(w2)) so the score stays
  * in integer arithmetic (PMI is its log — monotone, so the ranking is
  * identical and no transcendentals enter; same doctrine as the odds-idf
  * BM25):
  *
  *   lift_e6 = (c12 * 1e6 div c1) * N div c2
  *
  * where c12 = bigram count, c1/c2 = unigram counts of the positions,
  * N = total bigram count. Integer-exact, so the q106 oracle
  * hash-matches. The two-step division keeps every intermediate under
  * Long overflow for corpora up to ~9e12 bigrams (~40 TB of text);
  * beyond that, swap the arithmetic to decimal(38,0) — the plan shape
  * is unchanged.
  *
  * Scale shape: bigram and unigram counts are partial-agg shuffles
  * (map-side combine — the reducer sees one row per distinct gram per
  * partition); `minCount` prunes the long tail BEFORE the two unigram
  * joins (both sides of which are vocabulary-sized, not corpus-sized);
  * the final top-k is sort-limited (TakeOrderedAndProject), never a
  * global sort materialization. N rides the plan as a broadcast
  * one-row aggregate.
  */
object Collocations {

  /** Top-`k` collocations by lift among bigrams with count >=
    * `minCount`: (w1, w2, c12, c1, c2, lift_e6), ties broken by
    * (w1, w2) ascending. */
  def topByLift(docs: DataFrame, k: Int = 100, minCount: Long = 30L,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = graft.sources.Tables.widen(
      docs.select(TextAnalysis.wordsCol(col(textCol)).as("__ws")))
    // two COLUMNAR corpus scans (bigram agg, unigram agg) — deliberately
    // NOT a checkpoint of the tokenized corpus, which would materialize
    // ~the whole text to executor storage (the wide-table rule the
    // line/span dedups follow). What IS checkpointed is the UNFILTERED
    // bigram-count table: vocabulary-sized and narrow, and both the
    // minCount survivors and the total-N aggregate read it.
    val bc0 = words
      .select(explode(TextAnalysis.bigramsOf("__ws")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(eager = false)
    val bc = bc0.filter(col("c12") >= minCount)
    val uni = words.select(explode(col("__ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = bc0.agg(coalesce(sum("c12"), lit(0L)).as("n_bigrams"))
    bc
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n))
      .withColumn("lift_e6",
        expr("(c12 * 1000000L div c1) * n_bigrams div c2"))
      .select("w1", "w2", "c12", "c1", "c2", "lift_e6")
      .orderBy(col("lift_e6").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
