package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch: per group, keep the k rows
  * with the smallest portable row hash — a uniform-without-replacement
  * sample whose membership is a pure function of the row ids — and
  * estimate each requested quantile as the corresponding order
  * statistic of the sample.
  *
  * Three properties make this the STREAMING/100 TB companion to the
  * exact [[Quantiles]] (which needs the whole input per counting
  * round and stays the batch path):
  *
  *   - ORDER-INDEPENDENT, MERGEABLE state: bottom-k by hash of any
  *     union = bottom-k of the merged bottom-k's, regardless of
  *     arrival order or partitioning. The streaming form
  *     ([[graft.streaming.Streaming.quantileSketchStream]]) therefore
  *     agrees BIT-FOR-BIT with this batch form on the same data — a
  *     stronger driver-check than the q109/q127 ordered-replay
  *     doctrine, with no order pinning needed.
  *   - BOUNDED state: k rows per group, ever. A group of 10^9 rows
  *     costs the same 64-row summary as a group of 100.
  *   - DETERMINISTIC + portable: membership comes from
  *     squareMix(polyHash(id)) — the cross-engine hash family every
  *     oracle replays — so the whole estimate is hash-checkable in
  *     DuckDB (q135), unlike classic KLL/t-digest whose randomized
  *     compaction defeats replay.
  *
  * Accuracy is the plain sampling bound: a uniform sample of size k
  * estimates any quantile within O(sqrt(ln(1/δ)/k)) rank error w.h.p.
  * (QuantileSketchSpec pins it empirically); for exact answers use
  * [[Quantiles]]. The top-k window below carries Spark's
  * WindowGroupLimit rank-limit pushdown, so each partition forwards
  * at most k rows per group to the single shuffle — the same lossless
  * prune as the KMV sketch.
  */
object QuantileSketch {

  /** The portable membership hash: squareMix(polyHash(id)) with the id
    * itself as tie-break (ids are unique, so ordering is total). */
  def memberHash(idCol: Column): Column =
    graft.functions.Hashing.squareMixCol(
      graft.functions.Hashing.polyHashCol(idCol.cast("string")))

  /** Per-group bottom-k sample: (groupCols..., idCol, valueCol, __h)
    * rows whose (hash, id) rank within the group is ≤ k. */
  def bottomKSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                    valueCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__h"), col(idCol))
    df.select(groupCols.map(col) :+ col(idCol) :+
        col(valueCol).cast("long").as(valueCol): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__h", memberHash(col(idCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group quantile ESTIMATES from the bottom-k sample: for each
    * q, the sample value at 1-based rank max(1, ceil(q·m)) (m = sample
    * size) under (value, hash, id) order — integer rank arithmetic on
    * the e4-scaled q so both engines compute the identical rank, and
    * the same >=1 clamp as the streaming form (q = 0.0 emits the group
    * minimum in BOTH execution models — the batch/stream bit-parity
    * contract holds at the edge too). Output: groupCols ++ (q_e4, est).
    *
    * PRECONDITION: `idCol` values are unique. A duplicated id keeps
    * both rows in the batch sample here, while the streaming state map
    * keys on id (last value wins) — parity requires unique ids, the
    * same identity contract every index/gate operator states. */
  def quantileEstimates(df: DataFrame, groupCols: Seq[String],
                        idCol: String, valueCol: String,
                        qs: Seq[Double], k: Int = 64): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must lie in [0, 1], got: ${qs.mkString(", ")}")
    val sample = bottomKSample(df, groupCols, idCol, valueCol, k)
    val vw = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol), col("__h"), col(idCol))
    val mw = Window.partitionBy(groupCols.map(col): _*)
    val ranked = sample
      .withColumn("__vrn", row_number().over(vw))
      .withColumn("__m", count(lit(1)).over(mw))
    val qcol = explode(array(qs.map(q =>
      lit(math.round(q * 10000.0))): _*)).as("q_e4")
    ranked
      .select(groupCols.map(col) ++ Seq(col(valueCol), col("__vrn"),
        col("__m"), qcol): _*)
      // integer max(1, ceil(q_e4·m / 10^4)): identical arithmetic in
      // the oracle AND in quantileSketchStream's math.max(rank, 1)
      .filter(col("__vrn") ===
        greatest(lit(1L), expr("(q_e4 * __m + 9999) div 10000")))
      .select(groupCols.map(col) ++ Seq(col("q_e4"),
        col(valueCol).as("est")): _*)
  }
}
