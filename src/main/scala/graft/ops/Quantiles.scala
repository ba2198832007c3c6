package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** EXACT quantiles at 100 TB without a global sort: iterative bucket
  * selection. A windowed `row_number() OVER (ORDER BY v)` (the q51
  * per-group shape, and what the q126 oracle runs) funnels every row
  * through one ordering — fine per small group, fatal globally. This
  * operator instead narrows each requested rank with histogram rounds:
  * every round is ONE treeAggregate counting pass over the rows still
  * in any active rank's range (counts combine up the tree — no row
  * ever moves, and the driver receives one buckets × ranks array, not
  * one per partition), the driver walks the bounded histogram to the
  * bucket containing the rank, and the range shrinks by the bucket
  * factor. With 64-bit values and 2^16 buckets the answer is EXACT
  * after at most 4 rounds — the classic selection-vs-sort trade.
  *
  * Width/offset arithmetic is done in BigInt on the DRIVER (a full
  * Long-spanning range overflows `hi - lo`); executors use unsigned
  * 64-bit division, which is exact for any span. NULL values are
  * excluded (from both the histogram and the rank denominator).
  *
  * Rank convention: the value at 1-based rank ceil(q·n) under
  * ascending order — identical to the q51 oracle's row_number compare
  * (ties/duplicates handled naturally: counting is over row
  * multiplicity, not distinct values).
  */
object Quantiles {

  private def nonNullVals(df: DataFrame, valueCol: String): Dataset[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(valueCol).cast("long").as("value"))
      .filter(col("value").isNotNull).as[Long]
  }

  /** Histogram narrowing over an already-typed non-null value set. */
  private def narrow(vals: Dataset[Long], gMin: Long, gMax: Long,
                     ranks: Seq[Long], buckets: Int): Map[Long, Long] = {
    val spark = vals.sparkSession
    val nB = buckets
    val state = scala.collection.mutable.LinkedHashMap(
      ranks.distinct.map(r => r -> (gMin, gMax, r)): _*)
    var round = 0
    while (state.values.exists { case (lo, hi, _) => lo < hi } && round < 64) {
      // slot `i` is the position within THIS round's active set — the
      // histogram array is sized active.length*nB, so indexing by the
      // entry's position in the full `state` map would walk off the end
      // as soon as one rank converges before a later-ordered one
      val active = state.toSeq.collect {
        case (r, (lo, hi, t)) if lo < hi =>
          // span can exceed Long.MaxValue — width math in BigInt;
          // w <= span/nB + 1 <= 2^63/2 always fits a Long
          val w = ((BigInt(hi) - BigInt(lo)) / nB + 1).toLong
          (r, lo, hi, t, w)
      }.zipWithIndex.map { case ((r, lo, hi, t, w), i) =>
        (i, r, lo, hi, t, w)
      }
      val bc = spark.sparkContext.broadcast(
        active.map { case (i, _, lo, hi, _, w) => (i, lo, hi, w) })
      val hist = vals.rdd.treeAggregate(new Array[Long](active.length * nB))(
        (acc, v) => {
          val rs = bc.value
          var j = 0
          while (j < rs.length) {
            val (i, lo, hi, w) = rs(j)
            if (v >= lo && v <= hi) {
              // v - lo wraps for spans > Long.MaxValue, but is correct
              // as an UNSIGNED 64-bit difference — divide accordingly
              val b = java.lang.Long.divideUnsigned(v - lo, w).toInt
              acc(i * nB + b) += 1L
            }
            j += 1
          }
          acc
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
      active.foreach { case (i, r, lo, hi, t, w) =>
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
        val bLo = BigInt(lo) + BigInt(b) * w
        val bHi = (bLo + w - 1).min(BigInt(hi))
        state(r) = (bLo.toLong, bHi.toLong, rem)
      }
      round += 1
    }
    // each round shrinks every active span by ~nB so 64 rounds always
    // suffice — but fail loudly, never return an unconverged bound
    require(state.values.forall { case (lo, hi, _) => lo == hi },
      "selection did not converge — raise `buckets`")
    state.map { case (r, (lo, _, _)) => r -> lo }.toMap
  }

  /** Values at the given 1-based ranks of `valueCol` ascending
    * (nulls excluded). Driver state: buckets × ranks counters. */
  def selectRanks(df: DataFrame, valueCol: String, ranks: Seq[Long],
                  buckets: Int = 1 << 16): Map[Long, Long] = {
    require(buckets >= 2, "need at least 2 buckets")
    val vals = nonNullVals(df, valueCol)
    val mm = vals.agg(min("value").as("lo"), max("value").as("hi")).head()
    require(!mm.isNullAt(0), "selectRanks needs a non-empty input")
    narrow(vals, mm.getLong(0), mm.getLong(1), ranks, buckets)
  }

  /** Per-GROUP exact quantiles by the same histogram narrowing — the
    * scale path q51's `row_number() OVER (PARTITION BY group)` window
    * cannot take: a window funnels each group through ONE task (the
    * same shape capPerGroup exists to avoid), while here every round is
    * one treeAggregate over all groups at once and no row ever moves.
    * Each active (group, rank) owns a bucket strip in the per-round
    * histogram; the strip width adapts (`maxSlots / active`, floor 4)
    * so the aggregate array stays bounded no matter how many groups are
    * active — more groups just means narrower strips and a few more
    * rounds (log_nB(span) each).
    *
    * Driver state: groups × qs ranges plus one NARROW stats tuple
    * per group — (packed key, n, lo, hi), never the group columns
    * themselves, so wide group columns cost the driver nothing; the
    * original group values are recovered by a final broadcast join on
    * the packed key. The operator is for BOUNDED group counts
    * (sources, languages, shards; `maxGroups` guards the contract
    * loudly). Group columns are packed into one NUL-separated key
    * with an INJECTIVE per-part encoding: NULL → "n" (concat_ws
    * silently SKIPS null arguments, which would alias (NULL,"x") with
    * ("x")), non-null → "v" + the value with \u0001 → \u0001e and
    * \u0000 → \u00010 escaped — so group strings containing the
    * separator cannot alias either. NULL values are excluded per
    * group; empty groups cannot occur (groups come from the data).
    *
    * Output: groupCols (original types) ++ (q_e4, value) — value at
    * 1-based rank ceil(q·n_group), the q51 oracle convention. */
  def groupedQuantiles(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, qs: Seq[Double],
                       buckets: Int = 1 << 16,
                       maxGroups: Int = 1 << 20): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qs.nonEmpty, "need at least one quantile")
    require(buckets >= 4, "need at least 4 buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val keyExpr = concat_ws("\u0000",
      groupCols.map { c =>
        val str = col(c).cast("string")
        when(str.isNull, lit("n")).otherwise(concat(lit("v"),
          replace(replace(str, lit("\u0001"), lit("\u0001e")),
            lit("\u0000"), lit("\u00010"))))
      }: _*)
    val keyed = df
      .select(keyExpr.as("k"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull).as[(String, Long)]
    // ONE stats pass per group also recovers a representative of the
    // ORIGINAL (typed) group column values via first(): within a
    // packed key every row carries identical group values (the
    // encoding is injective), so first() is deterministic. The result
    // (≤ maxGroups rows) is reused for the final join — recovering the
    // values afterwards would re-scan and re-shuffle the FULL df a
    // second time for data this pass already saw. localCheckpoint, not
    // persist: persist registers the plan in the shared CacheManager,
    // which holds a strong reference a long-lived session never drops
    // (and can silently substitute the cached fragment into later
    // matching queries); checkpointed RDD blocks are ContextCleaner-
    // managed and die with the result's GC (the Streaming/Fuzzy
    // doctrine).
    val statsFull = df
      .select(keyExpr.as("__k") +: col(valueCol).cast("long").as("__v") +:
        groupCols.map(col): _*)
      .filter(col("__v").isNotNull)
      .groupBy("__k")
      .agg(count(lit(1)).as("__n"),
        min("__v").as("__lo") +: max("__v").as("__hi") +:
          groupCols.map(c => first(col(c)).as(c)): _*)
      .localCheckpoint(eager = false)
    // NARROW driver payload: (packed key, n, lo, hi) only — the group
    // columns themselves never ride the collect (a wide group column
    // × a million groups is real driver memory); they stay on the
    // executors in statsFull and join back at the end
    val stats: Array[(String, Long, Long, Long)] = statsFull
      .select(col("__k"), col("__n"), col("__lo"), col("__hi"))
      .as[(String, Long, Long, Long)]
      .collect()
    require(stats.length <= maxGroups,
      s"${stats.length} groups exceed maxGroups=$maxGroups — " +
        "groupedQuantiles is for bounded group counts")
    // (group, rank) -> (lo, hi, remaining-rank-within-range)
    val state = scala.collection.mutable.LinkedHashMap.empty[
      (String, Long), (Long, Long, Long)]
    val rankOf = stats.map { case (k, n, lo, hi) =>
      val ranks = qs.map(q => math.max(1L, math.ceil(q * n).toLong))
      ranks.distinct.foreach(t => state((k, t)) = (lo, hi, t))
      k -> qs.zip(ranks).toMap
    }.toMap
    val maxSlots = 1 << 20
    var round = 0
    while (state.values.exists { case (lo, hi, _) => lo < hi } && round < 64) {
      val active = state.toSeq.collect {
        case ((k, r), (lo, hi, t)) if lo < hi => (k, r, lo, hi, t)
      }
      val nB = math.max(4, math.min(buckets, maxSlots / active.length))
      val slotted = active.zipWithIndex.map { case ((k, r, lo, hi, t), i) =>
        val w = ((BigInt(hi) - BigInt(lo)) / nB + 1).toLong
        (i, k, r, lo, hi, t, w)
      }
      val bc = spark.sparkContext.broadcast(
        slotted.groupBy(_._2).map { case (k, ss) =>
          k -> ss.map { case (i, _, _, lo, hi, _, w) => (i, lo, hi, w) }.toArray
        })
      // histogram allocated per PARTITION, not captured as a
      // treeAggregate zeroValue — a slots-sized zero array in the task
      // closure ships with every stage (measured: 96 MiB task binaries
      // at 4M slots); here the closure carries only the length
      val histLen = slotted.length * nB
      val hist = keyed.rdd.mapPartitions { it =>
        val acc = new Array[Long](histLen)
        it.foreach { kv =>
          val rs = bc.value.getOrElse(kv._1, null)
          if (rs != null) {
            val v = kv._2
            var j = 0
            while (j < rs.length) {
              val (i, lo, hi, w) = rs(j)
              if (v >= lo && v <= hi) {
                val b = java.lang.Long.divideUnsigned(v - lo, w).toInt
                acc(i * nB + b) += 1L
              }
              j += 1
            }
          }
        }
        Iterator.single(acc)
      }.treeReduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      slotted.foreach { case (i, k, r, lo, hi, t, w) =>
        var b = 0
        var acc = 0L
        var rem = t
        var found = false
        while (b < nB && !found) {
          val c = hist(i * nB + b)
          if (acc + c >= t) { rem = t - acc; found = true }
          else { acc += c; b += 1 }
        }
        require(found, s"rank $t exceeds the row count in [$lo, $hi]")
        val bLo = BigInt(lo) + BigInt(b) * w
        val bHi = (bLo + w - 1).min(BigInt(hi))
        state((k, r)) = (bLo.toLong, bHi.toLong, rem)
      }
      round += 1
    }
    require(state.values.forall { case (lo, hi, _) => lo == hi },
      "grouped selection did not converge — raise `buckets`")
    val res = rankOf.toSeq.flatMap { case (k, qr) =>
      qs.map(q => (k, math.round(q * 10000.0), state((k, qr(q)))._1))
    }.toDF("__k", "q_e4", "value")
    // recover the original group columns (original types) from the
    // checkpointed stats pass — no extra scan of df, no driver
    // shipping; the checkpoint's RDD blocks back the returned lazy
    // plan and are ContextCleaner-reclaimed once the result is GC'd
    statsFull.select(groupCols.map(col) :+ col("__k"): _*)
      .join(broadcast(res), Seq("__k"))
      .select(groupCols.map(col) ++ Seq(col("q_e4"), col("value")): _*)
  }

  /** (q_e4, value) rows for quantiles `qs` of `valueCol`: value at
    * 1-based rank ceil(q·n) over the NON-NULL values, q reported as
    * round(q·1e4) (floor would mangle binary-inexact fractions —
    * floor(0.99·1e4) is 9899). ONE stats pass (count+min+max in a
    * single aggregation) precedes the counting rounds. */
  def quantiles(df: DataFrame, valueCol: String,
                qs: Seq[Double], buckets: Int = 1 << 16): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val spark = df.sparkSession
    val vals = nonNullVals(df, valueCol)
    val stats = vals.agg(count(lit(1)).as("n"), min("value").as("lo"),
      max("value").as("hi")).head()
    val n = stats.getLong(0)
    require(n > 0, "quantiles needs a non-empty input")
    val ranks = qs.map(q => math.max(1L, math.ceil(q * n).toLong))
    val byRank = narrow(vals, stats.getLong(1), stats.getLong(2),
      ranks, buckets)
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
