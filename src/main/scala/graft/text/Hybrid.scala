package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine per-query rankings from different
  * retrievers (BM25 keywords, dense vectors, …) by reciprocal-rank
  * fusion (Cormack et al. 2009) — rrf(d) = Σ_lists 1/(k₀ + rank_d).
  * Rank-based fusion needs no score normalization across retrievers,
  * which is why it is the standard first fusion in hybrid search.
  *
  * Determinism: each list's contribution is floor(10^6 / (k₀ + rank))
  * — integer-quantized BEFORE the sum, so the fused score is an
  * order-free BIGINT sum both engines compute identically (the
  * quantize-then-sum doctrine).
  *
  * Scale shape: inputs already carry per-query ranks (produced by
  * their retrievers' query-partitioned windows); fusion is a unionAll
  * of (query, id, contribution) rows + ONE partial-agg sum + a
  * query-partitioned top-k window — nothing global, nothing collected,
  * candidate rows ~24 bytes. */
object Hybrid {

  /** Attach 1-based ranks to an ALREADY top-k-cut single-query list
    * (e.g. [[Bm25.topK]]'s ≤k rows): the window partitions on the
    * injected constant query id, so the one task it funnels holds ≤k
    * rows BY CONSTRUCTION (the cut ran first) — not a corpus-sized
    * partition-less window. The constant rides an
    * [[graft.expressions.Opaque]] barrier so Catalyst cannot fold the
    * partition key away: the physical WindowExec KEEPS its partition
    * spec, and the `No Partition Defined` warning channel stays a
    * usable regression signal for real unpartitioned windows. */
  def rankCut(cut: DataFrame, queryId: Long,
              orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(orderCols: _*)
    cut.withColumn("query_id",
        graft.expressions.Opaque.col(lit(queryId)))
      .withColumn("rank", row_number().over(w))
  }

  /** Fuse `rankings` — each (queryCols…, idCol, rankCol) — into the
    * per-query top-`k` by RRF. Output: queryCols ++ (idCol, rrf_e6,
    * rank). Ties (equal fused score) break by idCol ascending. */
  def rrf(rankings: Seq[DataFrame], queryCols: Seq[String],
          idCol: String, rankCol: String = "rank",
          k: Int = 10, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(queryCols.nonEmpty,
      "rrf needs the query columns — a query-less fusion would rank " +
        "through one global window")
    // `div`, not `/`: Column `/` on longs is IEEE double division, and
    // the oracle's `//` is integer — `div` keeps both sides in BIGINT
    val parts = rankings.map(df =>
      df.select(queryCols.map(col) :+ col(idCol) :+
        expr(s"1000000L div ($kRrf + cast(`$rankCol` as bigint))")
          .as("__c"): _*))
    val fused = parts.reduce(_ unionByName _)
      .groupBy(queryCols.map(col) :+ col(idCol): _*)
      .agg(sum("__c").as("rrf_e6"))
    val w = Window.partitionBy(queryCols.map(col): _*)
      .orderBy(col("rrf_e6").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
