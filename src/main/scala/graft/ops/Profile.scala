package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution profiling — the pre-flight check that DECIDES the scale
  * strategy: a key whose share is a few percent of a 100 TB fact table
  * is the signal to salt a join ([[Relational.saltedJoin]]) or lean on
  * AQE skew handling before the job runs, not after it dies.
  */
object Profile {

  /** Top-`topN` heaviest key tuples with exact counts and integer-exact
    * corpus share (n·1e6 div total). One partial-agg count shuffle on
    * the keys, a broadcast 1-row total folded into the plan (no eager
    * job), and a TakeOrdered for the top-N — only `topN` rows ever
    * reach the driver/output. Deterministic order: count desc, then
    * key columns asc. */
  /** Per-group HLL++ distinct-count sketch next to the exact row count —
    * the 100 TB dedup-stats shape (SURVEY §2 extension target): the
    * sketch is fixed-size mergeable state, so the full-corpus pass is
    * one partial aggregation with map-side combine, no shuffle of
    * values. `rsd` is the HLL relative standard deviation (Spark
    * default 0.05). Deterministic for fixed input + rsd (hash-based, no
    * RNG; merge order-independent), but NOT hash-comparable across
    * engines — the driver records a rows-only check; ProfileSpec gates
    * accuracy against exact distinct counts. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** KMV (k-minimum-values) distinct-count estimate per group — the
    * hash-checked companion to [[approxDistinct]] (q78's HLL++ words are
    * engine-internal; KMV over the PORTABLE polynomial hash is plain
    * SQL arithmetic both engines replay bit-for-bit, false-sharing and
    * all). Estimator (Bar-Yossef et al. 2002): hash every value into
    * [0, P), keep the k smallest DISTINCT hashes per group; if fewer
    * than k exist the count is exact, else est = floor((k-1)·P / h_k)
    * with h_k the k-th smallest — integer-exact, no floats. NULL
    * values are excluded (a distinct-count of nulls is not meaningful
    * and engines disagree on NULL ordering).
    *
    * The hash is squareMix(polyHash(value)) — the raw polynomial of a
    * short value never wraps P, so its order statistics are nowhere
    * near uniform (a KMV death sentence: the estimate is only as good
    * as the hash's uniformity); the quadratic scatter restores the
    * random baseline (see Hashing.squareMix — same reason SRP needs
    * it).
    *
    * Scale shape: a compiled map-side prune first — each task keeps a
    * bounded per-group set of its k smallest locally-distinct hashes
    * (groups × k longs of task memory), so the exchange carries at most
    * k·partitions rows per group instead of the full distinct value
    * set. The prune is LOSSLESS for the answer: every global k-smallest
    * hash has local rank ≤ its global rank and survives its partition's
    * cut, and the exact-count fallback only fires when the merged set
    * is smaller than k — exactly when the prune kept everything. The
    * pruned survivors then dedup + rank via a WindowGroupLimit-pruned
    * window. Output: (groupCols…, kmv_distinct). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 256): DataFrame = {
    require(k >= 2, "k must be >= 2")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Row
    val spark = df.sparkSession
    val P = graft.functions.Hashing.P
    val g = groupCols.map(col)
    val ph = graft.functions.Hashing.polyHashCol(col(valueCol).cast("string"))
    val hashed = df
      .select(g :+ graft.functions.Hashing.squareMixCol(ph).as("__h"): _*)
    val schema = hashed.schema
    val nG = groupCols.length
    val kk = k
    val prunedRdd = hashed.rdd.mapPartitions { it =>
      // heap key AND emitted key both come from canon(): array-typed
      // group values (binary columns) compare by reference as map keys,
      // which would silently degrade the prune to one heap per row —
      // canonicalize to Seq so value equality applies (SQL equality
      // downstream is unaffected either way)
      def canon(v: Any): Any = v match {
        case a: Array[_] => a.toSeq
        case x => x
      }
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], (Seq[Any], java.util.TreeSet[java.lang.Long])]
      it.foreach { row =>
        if (!row.isNullAt(nG)) {
          val raw = (0 until nG).map(row.get)
          val key = raw.map(canon)
          val (_, set) = heaps.getOrElseUpdate(key,
            (raw, new java.util.TreeSet[java.lang.Long]()))
          set.add(row.getLong(nG))
          if (set.size > kk) set.pollLast()
        }
      }
      heaps.valuesIterator.flatMap { case (raw, set) =>
        val it2 = set.iterator()
        new Iterator[Row] {
          def hasNext: Boolean = it2.hasNext
          def next(): Row = Row.fromSeq(raw :+ it2.next().longValue())
        }
      }
    }
    val distinctH = spark.createDataFrame(prunedRdd, schema)
      .distinct()
    val counts = distinctH.groupBy(g: _*)
      .agg(count(lit(1)).as("__n_hashes"))
    val w = Window.partitionBy(g: _*).orderBy(col("__h").asc)
    val kth = distinctH.withColumn("__r", row_number().over(w))
      .filter(col("__r") === k)
      .select(g :+ col("__h").as("__kth"): _*)
    // INTEGER division (div, not /): a double quotient could floor to a
    // different integer than the exact one near ulp boundaries, and the
    // oracle replays the same integer op
    val num = (k - 1).toLong * P
    // NULL-SAFE join on the group key: a NULL group with >= k distinct
    // values would otherwise never match its kth row and fall back to
    // the (post-prune, meaningless) count
    val joinCond = groupCols.map(c => counts(c) <=> kth(c)).reduce(_ && _)
    counts.join(kth, joinCond, "left_outer")
      .select(groupCols.map(counts(_)) :+
        when(kth("__kth").isNull, counts("__n_hashes"))
          .otherwise(expr(s"${num}L div __kth"))
          .as("kmv_distinct"): _*)
  }

  def keySkew(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).cast("long").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_e6", expr("n * 1000000 div greatest(__total, 1)"))
      .drop("__total")
      .orderBy(col("n").desc +: keys.map(col(_).asc): _*)
      .limit(topN)
  }
}
