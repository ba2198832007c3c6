package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** DSIR-shape importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score raw-corpus
  * documents by how much their hashed n-gram feature distribution looks
  * like a (small) target corpus rather than the raw corpus itself. The
  * classic recipe buckets n-grams into B hash buckets, fits two bucket
  * multinomials (target/raw, add-one smoothed), and weighs a document by
  * the product of per-feature probability ratios.
  *
  * This implementation keeps the exact distributed shape but replaces
  * the floating log-sum with INTEGER-quantized per-bucket ratios so the
  * score is bit-identical across engines and aggregation orders (the
  * q98 oracle replays it in SQL — a float log-sum could never
  * hash-match; same design as the q68/q95 LM scores):
  *
  *   p_e9(b)  = (count(b) + 1) * 1e9 div (total + B)      per corpus
  *   r_e6(b)  = clamp(p_t_e9(b) * 1e6 div max(p_r_e9(b), 1), 1e3, 1e9)
  *   score(d) = sum over word occurrences of r_e6(bucket(word))
  *
  * The clamp at [0.001x, 1000x] is standard DSIR practice (extreme
  * ratios from near-empty buckets otherwise dominate) and also bounds
  * the score sum far below Long overflow for any real document length.
  *
  * Integer envelope: the p_e9 numerators need (bucketCount + 1) * 1e9
  * to fit a Long, i.e. per-bucket counts below ~9.2e9 — with B = 256
  * that is ~2.4e12 total word occurrences (roughly 10 TB of text) per
  * model fit. Beyond that, fit the model on a hash-sampled slice (the
  * statistically standard choice — bucket probabilities converge long
  * before 10 TB) or swap the two aggregates to decimal(38,0); the plan
  * shape is unchanged either way.
  *
  * Scale shape (100 TB): both bucket tables aggregate map-side into at
  * most B rows (B=256 default — a few KB crosses the wire per
  * partition); the ratio table is driver-built from 2*B numbers and
  * broadcast; scoring is explode -> broadcast-join -> per-doc partial
  * agg — ONE shuffle on doc_id, no corpus-sized model state anywhere.
  * The reference has no counterpart (nearest is frequency counting in
  * razu/pandasutils.py); this is an extension-tier operator.
  */
object Dsir {

  /** Per-bucket word-occurrence counts of a corpus: (bucket, c) with
    * bucket = polyhash(word) mod B. At most B rows survive the agg. */
  private def bucketCounts(df: DataFrame, textCol: String,
                           buckets: Int): DataFrame =
    df.select(explode(TextAnalysis.wordsCol(col(textCol))).as("__w"))
      .select(pmod(Hashing.polyHashCol(col("__w")), lit(buckets.toLong))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** Importance-ratio table over the full bucket domain 0..B-1:
    * (bucket, r_e6). Built distributed (two tiny aggs + outer join on a
    * range frame), materialized only to broadcast its B rows. */
  def ratioTable(raw: DataFrame, target: DataFrame,
                 textCol: String = "text", buckets: Int = 256): DataFrame = {
    val spark = raw.sparkSession
    val domain = spark.range(buckets).select(col("id").cast("long").as("bucket"))
    val t = bucketCounts(target, textCol, buckets)
      .withColumnRenamed("c", "ct")
    val r = bucketCounts(raw, textCol, buckets)
      .withColumnRenamed("c", "cr")
    val totT = t.agg(coalesce(sum("ct"), lit(0L)).as("tt"))
    val totR = r.agg(coalesce(sum("cr"), lit(0L)).as("tr"))
    val pT = expr(s"(coalesce(ct, 0L) + 1L) * 1000000000L div (tt + ${buckets}L)")
    val pR = expr(s"(coalesce(cr, 0L) + 1L) * 1000000000L div (tr + ${buckets}L)")
    domain
      .join(t, Seq("bucket"), "left").join(r, Seq("bucket"), "left")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .select(col("bucket"), pT.as("__pt"), pR.as("__pr"))
      .select(col("bucket"),
        least(greatest(expr("__pt * 1000000L div greatest(__pr, 1L)"),
          lit(1000L)), lit(1000000000L)).as("r_e6"))
  }

  /** Score every raw-corpus document: (id, n_words, score_e6) where
    * score_e6 = sum of clamped per-word importance ratios. The ratio
    * table (B rows) broadcasts; the only shuffle is the per-doc agg. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        buckets: Int = 256): DataFrame = {
    val ratios = broadcast(ratioTable(raw, target, textCol, buckets))
    graft.sources.Tables.widen(
        raw.select(col(idCol).cast("long").as(idCol),
          TextAnalysis.wordsCol(col(textCol)).as("__ws")))
      .select(col(idCol), explode(col("__ws")).as("__w"))
      .select(col(idCol),
        pmod(Hashing.polyHashCol(col("__w")), lit(buckets.toLong)).as("bucket"))
      .join(ratios, Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("r_e6").as("score_e6"))
  }
}
