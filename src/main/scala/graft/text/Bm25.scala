package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus — the lexical
  * counterpart of the dense ANN serving path (graft.sim.*): score every
  * document against a small query-term set with Okapi BM25 weighting
  * (k1 = 1.2, b = 0.75) and return the global top-k.
  *
  * The reference has no retrieval operator; this extends the engine's
  * training-data surface (eval-set mining, boilerplate hunting, lexical
  * dedup candidates) the same way the ANN family does for embeddings.
  *
  * Determinism (the q88 oracle replicates every step): idf uses the
  * RATIONAL odds form floor((N - df + 0.5) / (df + 0.5) · 1e6) — the
  * classic BM25 idf without the final log. log is strictly monotone, so
  * per-term document ranking is unchanged; only the relative weighting
  * of multi-term sums differs (rare terms weigh heavier than with
  * log-idf). The payoff is bit-exactness across engines: no
  * transcendental functions, whose last-ulp rounding differs between
  * libm implementations, anywhere in the pipeline. Every remaining step
  * is IEEE double arithmetic in a fixed operation order, floored to
  * bigints before the order-independent integer SUM per doc.
  *
  * Scale shape (100 TB corpus, handful of query terms):
  *   - doc lengths are a MAP-ONLY projection (size of the token split —
  *     no explode, no shuffle); the global (N, avgdl) reduce is the one
  *     eager job, emitting two scalars.
  *   - postings are explode → filter-to-query-terms BEFORE the
  *     aggregation shuffle, so only matching (doc, term) pairs — at most
  *     |docs|·|terms| rows — ever shuffle; the full inverted index is
  *     never materialized.
  *   - per-term df + idf ride a tiny broadcast (≤ |terms| rows).
  *   - the tf ⋈ dl join shuffles on doc id; the final top-k is
  *     sort-limited (TakeOrderedAndProject — k rows, not a global sort).
  */
object Bm25 {

  /** Quantized odds-idf: floor((N − df + 0.5) / (df + 0.5) · 1e6) —
    * ONE copy of the arithmetic for the in-memory paths and the
    * persisted-index probe ([[IncrementalBm25]]), so the replayed
    * oracle formula cannot drift between them. */
  private[text] def idfE6Col(nDocs: Long,
                             df: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(((lit(nDocs) - df).cast("double") + lit(0.5))
      / (df.cast("double") + lit(0.5)) * lit(1000000.0))
      .cast("long")

  /** Quantized per-(doc, term) BM25 weight (k1 = 1.2, b = 0.75):
    * floor(idf_e6 · tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl/avgdl))). */
  private[text] def wE6Col(idfE6: org.apache.spark.sql.Column,
                           tf: org.apache.spark.sql.Column,
                           dl: org.apache.spark.sql.Column,
                           avgdl: Double): org.apache.spark.sql.Column =
    floor(idfE6.cast("double") * (tf.cast("double") * lit(2.2))
      / (tf.cast("double")
        + lit(1.2) * (lit(0.25) + lit(0.75)
          * (dl.cast("double") / lit(avgdl)))))
      .cast("long")

  /** Score `docs` against `terms`, returning the top `k` rows
    * (doc_id, score_e6, n_terms) by quantized BM25 score (ties break to
    * the smaller doc id). `n_terms` = distinct query terms hit.
    *
    * `reuseTables = true` (default) lazily localCheckpoints the two
    * narrow intermediates (doc lengths; query-term postings) that are
    * each consumed by two branches — without it every branch re-scans
    * the corpus (the stats job, the idf build, and the scoring join are
    * four scans; with reuse, one). `false` keeps the whole computation
    * one lazy plan (PlanSpec inspects the pre-checkpoint shape). */
  def topK(docs: DataFrame, terms: Seq[String], k: Int = 20,
           textCol: String = "text", idCol: String = "doc_id",
           reuseTables: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def reuse(df: DataFrame): DataFrame =
      if (reuseTables) df.localCheckpoint(eager = false) else df
    // narrow (id, token-count) table, consumed by the stats job AND the
    // scoring join — lazily checkpointed so the corpus text is scanned
    // once for it, not once per consumer (the eager head() below
    // materializes it; the join reuses the blocks)
    val dl = reuse(docs.select(col(idCol).cast("long").as("id"),
      TextAnalysis.tokenCountCol(col(textCol)).cast("long").as("dl")))
    // one eager stats job: corpus size + average doc length (exact
    // integer→double division, replicated verbatim in the oracle)
    val (nDocs, totTok) = dl.agg(count(lit(1)), sum("dl")).as[(Long, Long)].head()
    require(nDocs > 0, "BM25 over an empty corpus")
    val avgdl = totTok.toDouble / nDocs.toDouble
    // query-term postings (≤ |terms| x |docs| rows — tiny), consumed by
    // the idf branch and the scoring join: checkpointed so the corpus
    // explode+filter runs once, not once per branch
    val tf = reuse(docs
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.wordsCol(col(textCol))).as("tok"))
      .filter(col("tok").isin(terms.distinct: _*))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf")))
    // df per query term (≤ |terms| rows) + quantized odds-idf, broadcast
    val idf = broadcast(
      tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .withColumn("idf_e6", idfE6Col(nDocs, col("df")))
        .select("tok", "idf_e6"))
    tf.join(dl, "id").join(idf, "tok")
      .withColumn("w_e6", wE6Col(col("idf_e6"), col("tf"), col("dl"), avgdl))
      .groupBy("id")
      .agg(sum("w_e6").as("score_e6"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_e6").desc, col("id").asc)
      .limit(k)
      .select(col("id").as(idCol), col("score_e6"), col("n_terms"))
  }

  /** BATCHED retrieval — score `docs` against a TABLE of queries
    * (`queryIdCol`, `termsCol` array&lt;string&gt;) and return each query's
    * top `k` (query_id, doc_id, score_e6, n_terms, rank), the same
    * batch contract the ANN serving paths take (every probe accepts a
    * queries DataFrame). Per-term statistics (df, idf, dl, avgdl) are
    * CORPUS-global and computed once for the whole batch, so each
    * query's rows equal [[topK]] run with its terms — spec-pinned.
    *
    * Scale shape: the corpus is scanned ONCE for doc lengths and ONCE
    * for postings regardless of batch size — queries enter as a small
    * broadcast (query_id, tok) table joined onto the term-filtered
    * postings, so adding a query adds broadcast rows, not jobs or
    * scans. Postings explode → semi-join against the batch's distinct
    * terms BEFORE the aggregation shuffle (no driver-side term
    * collect, no full inverted index); per-doc weights are computed
    * once per (doc, term) and fan out to the queries sharing the term
    * at ~24 bytes a row; the final top-k is one query-partitioned
    * window over ≤ |batch terms| × matching docs rows. */
  def topKBatch(docs: DataFrame, queries: DataFrame, k: Int = 20,
                textCol: String = "text", idCol: String = "doc_id",
                queryIdCol: String = "query_id",
                termsCol: String = "terms",
                reuseTables: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def reuse(df: DataFrame): DataFrame =
      if (reuseTables) df.localCheckpoint(eager = false) else df
    // (query_id, tok) pairs — duplicate terms dropped so a repeated
    // term cannot double its weight, WITHIN a row (array_distinct,
    // cheap pre-shuffle) and ACROSS rows of one query id
    // (dropDuplicates — a query split over several input rows must
    // behave like its merged term set); bounded by the batch
    val qt = reuse(queries.select(
        col(queryIdCol).cast("long").as("query_id"),
        explode(array_distinct(col(termsCol))).as("tok"))
      .dropDuplicates("query_id", "tok"))
    val dl = reuse(docs.select(col(idCol).cast("long").as("id"),
      TextAnalysis.tokenCountCol(col(textCol)).cast("long").as("dl")))
    val (nDocs, totTok) = dl.agg(count(lit(1)), sum("dl")).as[(Long, Long)].head()
    require(nDocs > 0, "BM25 over an empty corpus")
    val avgdl = totTok.toDouble / nDocs.toDouble
    // postings restricted to the batch's term set via a broadcast
    // semi-join — the terms stay distributed, no isin literal list
    val tf = reuse(docs
      .select(col(idCol).cast("long").as("id"),
        explode(TextAnalysis.wordsCol(col(textCol))).as("tok"))
      .join(broadcast(qt.select("tok").distinct()), Seq("tok"), "left_semi")
      .groupBy("id", "tok").agg(count(lit(1)).as("tf")))
    val idf = broadcast(
      tf.groupBy("tok").agg(count(lit(1)).as("df"))
        .withColumn("idf_e6", idfE6Col(nDocs, col("df")))
        .select("tok", "idf_e6"))
    val w = tf.join(dl, "id").join(idf, "tok")
      .withColumn("w_e6", wE6Col(col("idf_e6"), col("tf"), col("dl"), avgdl))
    val scored = w.join(broadcast(qt), Seq("tok"))
      .groupBy("query_id", "id")
      .agg(sum("w_e6").as("score_e6"), count(lit(1)).as("n_terms"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score_e6").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as(idCol), col("score_e6"),
        col("n_terms"), col("rank"))
  }
}
