package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic domain-mixture ORDERING — the write-time half of data
  * mixing a training pipeline needs beyond sampling ratios
  * ([[Curation]]'s token mixture picks WHAT to keep; this decides the
  * ORDER it is read in). A hash shuffle mixes sources only in
  * expectation — any prefix of the stream can be arbitrarily skewed. A
  * stride schedule (virtual-time scheduling, Waldspurger & Weihl's
  * lottery/stride family) makes every prefix carry the sources at
  * their target rates: doc r (1-based) of source s gets virtual time
  * (r * scale) / w_s, and the corpus is ordered by that key — a source
  * with twice the weight appears twice as often, from the first shard
  * onward, reproducibly.
  *
  * Scale shape (no per-source funnel): per-source ranks come from ONE
  * range shuffle on (source, order) plus an O(partitions + sources)
  * driver boundary-carry (the capPerGroup/interleavedSerieIds
  * discipline — a per-source row_number window would pull each source
  * through a single task); global positions come from
  * [[graft.ops.Relational.sequentialIds]]'s two-pass range shuffle.
  * Weights ride a broadcast join, never an isin literal list (the
  * q128 planning-cost lesson: thousands of In-literals cost seconds of
  * PLANNING). All arithmetic is integer — both engines replay it
  * bit-for-bit (q132).
  */
object Mixture {

  /** Appends, for every row of a weighted source, in deterministic
    * stride order:
    *
    *   source_rank   1-based rank of the row within its source (by
    *                 `order`, which must totally order rows per source)
    *   virtual_time  (source_rank * scale) / weight, integer division
    *   pos           1-based global position by (virtual_time, source,
    *                 source_rank)
    *
    * Rows of sources absent from `weights` are EXCLUDED — the weight
    * table is the mixture spec. `scale` should be a common multiple of
    * the weights for exact stride fairness (default lcm(1..16)). */
  def interleaveBySource(df: DataFrame, sourceCol: String,
                         order: Seq[org.apache.spark.sql.Column],
                         weights: Map[String, Long],
                         scale: Long = 720720L): DataFrame = {
    require(weights.nonEmpty, "mixture needs at least one weighted source")
    require(weights.values.forall(w => w > 0 && w <= scale),
      s"weights must be in 1..$scale")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(sourceCol, "__wt")
    val keyed = df.join(broadcast(wdf), Seq(sourceCol))
    val sorted = keyed.repartitionByRange((col(sourceCol) +: order): _*)
      .sortWithinPartitions((col(sourceCol) +: order): _*)
    val srcIdx = sorted.schema.fieldIndex(sourceCol)
    val wtIdx = sorted.schema.fieldIndex("__wt")
    val rdd = sorted.rdd
    // partition stats: per-source row counts, in partition order. Range
    // partitioning on (source, order) keeps each partition to a
    // contiguous source slice, so the collected state is
    // O(partitions + sources) — the same driver budget as the weights
    // map itself
    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { r =>
        val s = r.getString(srcIdx)
        m.update(s, m.getOrElse(s, 0L) + 1L)
      }
      Iterator.single((pid, m.toArray))
    }.collect().sortBy(_._1)
    val running = scala.collection.mutable.HashMap[String, Long]()
    val incoming: Map[Int, Map[String, Long]] = stats.map { case (pid, counts) =>
      val off = counts.map { case (s, _) =>
        (s, running.getOrElse(s, 0L)) }.toMap
      counts.foreach { case (s, n) =>
        running.update(s, running.getOrElse(s, 0L) + n) }
      (pid, off)
    }.toMap
    val bcIn = spark.sparkContext.broadcast(incoming)
    val maxRank = Long.MaxValue / scale
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField("source_rank", LongType, nullable = false),
      StructField("virtual_time", LongType, nullable = false)))
    val ranked = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val off = scala.collection.mutable.HashMap[String, Long]()
        bcIn.value.getOrElse(pid, Map.empty)
          .foreach { case (s, o) => off.update(s, o) }
        it.map { row =>
          val s = row.getString(srcIdx)
          val r = off.getOrElse(s, 0L) + 1L
          off.update(s, r)
          // loud guard, not silent wrap (the resample-grid doctrine)
          require(r <= maxRank,
            s"source_rank $r * scale $scale would overflow Long")
          Row.fromSeq(row.toSeq :+ r :+ (r * scale / row.getLong(wtIdx)))
        }
      }, schema)
      .drop("__wt")
    graft.ops.Relational.sequentialIds(ranked,
      Seq(col("virtual_time"), col(sourceCol), col("source_rank")),
      idCol = "pos")
  }
}
