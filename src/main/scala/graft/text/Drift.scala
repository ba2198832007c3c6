package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-drift monitoring — the snapshot-over-snapshot distribution
  * check a continuously-ingesting training-data pipeline runs before
  * mixing a new crawl in: compare the token distributions of two
  * corpus snapshots and surface (a) the total-variation distance and
  * (b) the tokens that moved most. TV distance is chosen over KL
  * divergence deliberately: it needs no logarithm, so with
  * probabilities quantized to e9 integers the whole report is exact
  * integer arithmetic — cross-engine reproducible (q125's oracle
  * replays it), unlike any transcendental-based divergence.
  *
  * Scale shape: one explode → partial-agg count per snapshot (map-side
  * combine), each snapshot's total folded in as a broadcast 1-row
  * aggregate (no eager job), a token-keyed full-outer join (tokens
  * missing from one side count as probability 0 — exactly the mass TV
  * must see), and a TakeOrdered top-N. Nothing driver-side beyond the
  * final rows.
  */
object Drift {

  /** Per-token e9-quantized probabilities of one snapshot:
    * (tok, pCol) with p = floor(count · 1e9 / total). */
  private def probs(df: DataFrame, textCol: String, pCol: String): DataFrame = {
    val counts = df
      .select(explode(TextAnalysis.wordsCol(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum("__c").cast("long").as("__t"))
    // DECIMAL(38) for the ×1e9 step: a stopword in a real crawl tops
    // 9.2e9 occurrences and BIGINT·1e9 would wrap (the oracle widens
    // to HUGEINT for the same reason)
    counts.crossJoin(broadcast(total))
      .select(col("tok"),
        expr("CAST((CAST(__c AS DECIMAL(38,0)) * 1000000000)" +
          " div greatest(__t, 1) AS BIGINT)").as(pCol))
  }

  /** Full drift table: (tok, p_a_e9, p_b_e9, diff_e9) over the union
    * vocabulary of both snapshots. */
  def tokenDrift(a: DataFrame, b: DataFrame,
                 textCol: String = "text"): DataFrame =
    probs(a, textCol, "p_a_e9")
      .join(probs(b, textCol, "p_b_e9"), Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("p_a_e9"), lit(0L)).as("p_a_e9"),
        coalesce(col("p_b_e9"), lit(0L)).as("p_b_e9"))
      .withColumn("diff_e9", abs(col("p_a_e9") - col("p_b_e9")))

  /** Drift report: the `topN` most-moved tokens, each row also carrying
    * the GLOBAL total-variation distance tv_e9 = Σ diff / 2 (a 1-row
    * broadcast fold — the headline drift number rides along without a
    * second query). */
  def driftReport(a: DataFrame, b: DataFrame, topN: Int = 50,
                  textCol: String = "text"): DataFrame = {
    val drift = tokenDrift(a, b, textCol)
    val tv = drift.agg(expr("sum(diff_e9) div 2").as("tv_e9"))
    drift.crossJoin(broadcast(tv))
      .orderBy(col("diff_e9").desc, col("tok").asc)
      .limit(topN)
  }
}
