package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT quantiles at 100 TB without a global sort: iterative bucket
  * selection. A windowed `row_number() OVER (ORDER BY v)` (the q51
  * per-group shape, and what the q126 oracle runs) funnels every row
  * through one ordering — fine per small group, fatal globally. This
  * operator instead narrows each requested rank with histogram rounds:
  * every round is ONE partial-agg aggregation over the rows still in
  * any active rank's range (map-side combine, counts only — no row
  * ever moves), the driver walks the bounded histogram (buckets ×
  * ranks longs of model state) to the bucket containing the rank, and
  * the range shrinks by the bucket factor. With 64-bit values and 2^16
  * buckets the answer is EXACT after at most 4 rounds — the classic
  * selection-vs-sort trade (4 counting scans beat one 100 TB shuffle
  * sort by orders of magnitude of exchanged bytes).
  *
  * Rank convention: the value at 1-based rank ceil(q·n) under
  * ascending order — identical to the q51 oracle's row_number compare
  * (ties/duplicates handled naturally: counting is over row
  * multiplicity, not distinct values).
  */
object Quantiles {

  /** Values at the given 1-based ranks of `valueCol` (long-typed)
    * ascending. Driver state: buckets × ranks counters per round. */
  def selectRanks(df: DataFrame, valueCol: String, ranks: Seq[Long],
                  buckets: Int = 1 << 16): Map[Long, Long] = {
    require(buckets >= 2, "need at least 2 buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("value")).as[Long]
    val mm = vals.agg(min("value").as("lo"), max("value").as("hi")).head()
    require(!mm.isNullAt(0), "selectRanks needs a non-empty input")
    val (gMin, gMax) = (mm.getLong(0), mm.getLong(1))
    // state per rank: (lo, hi] is inclusive range, t = remaining rank
    // within it; resolved once lo == hi
    val state = scala.collection.mutable.LinkedHashMap(
      ranks.distinct.map(r => r -> (gMin, gMax, r)): _*)
    var round = 0
    while (state.values.exists { case (lo, hi, _) => lo < hi } && round < 16) {
      val active = state.toSeq.zipWithIndex.collect {
        case ((r, (lo, hi, t)), i) if lo < hi => (i, r, lo, hi, t)
      }
      val bc = spark.sparkContext.broadcast(
        active.map { case (i, _, lo, hi, _) => (i, lo, hi) })
      val nB = buckets
      // one job: per (active rank, bucket) counts
      val hist = vals.mapPartitions { it =>
          val rs = bc.value
          val counts = new Array[Long](rs.length * nB)
          it.foreach { v =>
            rs.foreach { case (i, lo, hi) =>
              if (v >= lo && v <= hi) {
                // ceil-divided width so (hi - lo + 1) buckets always fit
                val w = ((hi - lo) / nB) + 1L
                counts(i * nB + ((v - lo) / w).toInt) += 1L
              }
            }
          }
          Iterator.single(counts)
        }
        .reduce { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        }
      active.foreach { case (i, r, lo, hi, t) =>
        val w = ((hi - lo) / nB) + 1L
        var b = 0
        var acc = 0L
        var rem = t
        var found = false
        while (b < nB && !found) {
          val c = hist(i * nB + b)
          if (acc + c >= t) {
            rem = t - acc
            found = true
          } else {
            acc += c
            b += 1
          }
        }
        require(found, s"rank $t exceeds the row count in [$lo, $hi]")
        val nLo = lo + b * w
        val nHi = math.min(hi, nLo + w - 1)
        state(r) = (nLo, nHi, rem)
      }
      round += 1
    }
    state.map { case (r, (lo, _, _)) => r -> lo }.toMap
  }

  /** (q_e4, value) rows for quantiles `qs` of `valueCol`: value at
    * 1-based rank ceil(q·n), q reported as round(q·1e4) (floor would
    * mangle binary-inexact fractions — floor(0.99·1e4) is 9899). */
  def quantiles(df: DataFrame, valueCol: String,
                qs: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val n = df.count()
    require(n > 0, "quantiles needs a non-empty input")
    val ranks = qs.map(q => math.max(1L, math.ceil(q * n).toLong))
    val byRank = selectRanks(df, valueCol, ranks)
    val rows = qs.zip(ranks).map { case (q, r) =>
      Row(math.round(q * 10000.0), byRank(r))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_e4",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
