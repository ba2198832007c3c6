package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketching — the custom typed-`Aggregator` (UDAF) tier:
  * a mergeable Misra-Gries heavy-hitters summary, and the two-pass
  * exact heavy-hitters operator built on it.
  *
  * Misra-Gries guarantee with k counters over n items: estimates
  * UNDER-count by at most n/(k+1) (est ≤ true ≤ est + n/(k+1)), and
  * every item with true count > n/(k+1) is present in the summary. The
  * summary is a few KB regardless of input size and merges
  * associatively (Agarwal et al., "Mergeable Summaries": sum matching
  * counters, then subtract the (k+1)-th largest and drop non-positive)
  * — exactly the partial/final shape Spark aggregation wants, so the
  * sketch pass is map-side work plus a constant-size merge, no shuffle
  * of the token stream.
  *
  * The aggregation buffer is a MUTABLE open-addressed map mutated in
  * place per token (the Aggregator contract explicitly permits
  * modifying and returning `b`): the original immutable-`Map` buffer
  * allocated a trie copy per token on the hot sketch path. Object
  * aggregation keeps the buffer as a JVM object between rows; the kryo
  * buffer encoder only runs at partial/final exchange boundaries.
  */
object Sketch {

  /** Immutable summary snapshot: counters plus the processed-item total
    * (the total makes the error bound n/(k+1) computable by the
    * caller). Also the streaming-state shape (Streaming.heavyHitterStream
    * stores one per group — product-encoded for the state store). */
  final case class MGSummary(counters: Map[String, Long], n: Long)

  /** Output entry: token with its under-estimate. */
  final case class MGEntry(token: String, estimate: Long)

  final case class MGResult(entries: Seq[MGEntry], n: Long)

  /** Mutable aggregation buffer (kryo-encoded across exchanges). */
  final class MGBuffer(
      val counters: scala.collection.mutable.HashMap[String, Long],
      var n: Long) extends Serializable {
    def toSummary: MGSummary = MGSummary(counters.toMap, n)
  }

  def emptyBuffer: MGBuffer =
    new MGBuffer(scala.collection.mutable.HashMap.empty, 0L)

  def bufferOf(s: MGSummary): MGBuffer = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    m ++= s.counters
    new MGBuffer(m, s.n)
  }

  /** One Misra-Gries token fold, in place — shared by the batch
    * Aggregator and the streaming per-batch fold so the two forms
    * cannot drift. */
  def foldToken(b: MGBuffer, tok: String, k: Int): Unit = {
    val c = b.counters
    c.get(tok) match {
      case Some(v) => c.update(tok, v + 1L)
      case None if c.size < k => c.update(tok, 1L)
      case None =>
        // decrement-all step: drop a unit from every counter (and the
        // unseen token's implicit counter) — k+1 distinct items each
        // lose one, which is where the n/(k+1) bound comes from
        c.mapValuesInPlace((_, v) => v - 1L)
        c.filterInPlace((_, v) => v > 0L)
    }
    b.n += 1L
  }

  /** Mergeable-summaries merge, in place into the larger side: sum
    * matching counters; if over k, subtract the (k+1)-th largest and
    * drop non-positive. Commutative — the fold direction only changes
    * which allocation survives. */
  def mergeBuffers(a: MGBuffer, b: MGBuffer, k: Int): MGBuffer = {
    val (big, small) =
      if (a.counters.size >= b.counters.size) (a, b) else (b, a)
    small.counters.foreach { case (t, v) =>
      big.counters.update(t, big.counters.getOrElse(t, 0L) + v)
    }
    if (big.counters.size > k) {
      val kth = big.counters.values.toArray
        .sorted(Ordering[Long].reverse)(k)
      big.counters.mapValuesInPlace((_, v) => v - kth)
      big.counters.filterInPlace((_, v) => v > 0L)
    }
    big.n = a.n + b.n
    big
  }

  /** Misra-Gries aggregator over a string column with `k` counters. */
  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuffer, MGResult] {
    require(k >= 1, "k must be >= 1")

    override def zero: MGBuffer = emptyBuffer

    override def reduce(b: MGBuffer, tok: String): MGBuffer = {
      foldToken(b, tok, k)
      b
    }

    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer =
      mergeBuffers(a, b, k)

    override def finish(r: MGBuffer): MGResult =
      MGResult(
        r.counters.toSeq
          .sortBy { case (t, v) => (-v, t) }
          .map { case (t, v) => MGEntry(t, v) },
        r.n)

    override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
    override def outputEncoder: Encoder[MGResult] = Encoders.product
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): a depth × width
    * counter matrix; each token occurrence adds 1 at one bucket per
    * row, a point estimate is the min over rows — OVER-counts by at
    * most ~2n/width with probability 1 − 2^−depth, never
    * under-counts. Complements [[MisraGries]]: MG carries a bounded
    * candidate set, CM answers a point query for ANY token after one
    * pass. Mergeable by elementwise sum.
    *
    * Hashes are the PORTABLE primitives (squareMix(polyHash) scattered
    * base, per-row reseed) — deterministic integer arithmetic, so the
    * q122 oracle replays the entire matrix bit-for-bit, collisions
    * included. Null tokens hash as the empty string. */
  final case class CMSketch(depth: Int, width: Int, table: Array[Long],
                            n: Long) {
    def estimate(tok: String): Long = {
      val base = CMSketch.baseOf(tok)
      var m = Long.MaxValue
      var j = 0
      while (j < depth) {
        m = math.min(m, table(j * width + CMSketch.bucket(base, j, width)))
        j += 1
      }
      m
    }
  }

  object CMSketch {
    def baseOf(tok: String): Long =
      graft.functions.Hashing.squareMix(
        graft.functions.Hashing.polyHash(if (tok == null) "" else tok))
    /** Per-row bucket: squareMix of the row-reseeded base. The square
      * AFTER the reseed is load-bearing: a plain affine reseed makes
      * every row's bucket a linear transform of one value, so two
      * tokens whose bases differ by a multiple of `width` collide in
      * EVERY row and the min never escapes (measured: 20× the expected
      * over-count). Squaring per row makes the row functions distinct
      * quadratics — pairwise-independent enough for the CM bound. */
    def bucket(base: Long, j: Int, width: Int): Int =
      (graft.functions.Hashing.squareMix(
        graft.functions.Hashing.reseed(base, j)) % width).toInt
  }

  /** One treeAggregate pass over a token column — only the
    * depth·width·8-byte matrix ever moves, never the token stream. */
  def countMin(df: DataFrame, column: String, depth: Int = 4,
               width: Int = 8192): CMSketch = {
    require(depth >= 1, "depth must be >= 1")
    require(width >= 2, "width must be >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val d = depth
    val w = width
    val (table, n) = df.select(col(column).cast("string")).as[String].rdd
      .treeAggregate((new Array[Long](d * w), 0L))(
        { case ((t, c), tok) =>
            val base = CMSketch.baseOf(tok)
            var j = 0
            while (j < d) { t(j * w + CMSketch.bucket(base, j, w)) += 1L; j += 1 }
            (t, c + 1L)
        },
        { case ((t1, c1), (t2, c2)) =>
            var i = 0
            while (i < t1.length) { t1(i) += t2(i); i += 1 }
            (t1, c1 + c2)
        })
    CMSketch(d, w, table, n)
  }

  /** Map-only point estimates against the broadcast sketch:
    * (column, cm_est) per input row. */
  def cmEstimates(df: DataFrame, column: String, sk: CMSketch): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(sk)
    df.select(col(column).cast("string")).as[String]
      .mapPartitions { it =>
        val s = bc.value
        it.map(t => (t, s.estimate(t)))
      }
      .toDF(column, "cm_est")
  }

  /** Deterministic sharded Misra-Gries replay: fold each shard of the
    * stream in `orderCols` order with [[foldToken]], then left-fold the
    * shard summaries in ascending-shard order with [[mergeBuffers]].
    *
    * The plain aggregator's candidate set depends on reduction order, so
    * q109's streaming form can only be rows-only checked. This operator
    * PINS the order — contiguous shards, a total order within each, a
    * fixed merge association — so the identical fold/merge arithmetic
    * becomes replayable step-for-step by the q127 recursive-CTE oracle
    * (the q116 BPE doctrine). Each shard folds inside one task
    * (repartition on the shard key + partition-local sort); the driver
    * holds shards × ≤k counters, the same bounded-summary shape as the
    * aggregator path. */
  def misraGriesSharded(df: DataFrame, shardCol: String,
                        orderCols: Seq[String], tokCol: String,
                        k: Int): MGResult = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df
      .select(col(shardCol).cast("long").as("shard"),
        struct(orderCols.map(col): _*).as("ord"),
        col(tokCol).cast("string").as("tok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .select($"shard", $"tok").as[(Long, String)]
    val summaries = rows.mapPartitions { it =>
      // partition-local sort makes each shard one contiguous run
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Map[String, Long], Long)]
      var cur = 0L
      var buf: MGBuffer = null
      it.foreach { case (sh, tok) =>
        if (buf == null || sh != cur) {
          if (buf != null) out += ((cur, buf.counters.toMap, buf.n))
          cur = sh
          buf = emptyBuffer
        }
        foldToken(buf, tok, k)
      }
      if (buf != null) out += ((cur, buf.counters.toMap, buf.n))
      out.iterator
    }.collect() // bounded driver state: shards × ≤k counters
    require(summaries.nonEmpty, "misraGriesSharded needs a non-empty input")
    val merged = summaries.sortBy(_._1)
      .map { case (_, m, n) => bufferOf(MGSummary(m, n)) }
      .reduceLeft((a, b) => mergeBuffers(a, b, k))
    MGResult(
      merged.counters.toSeq
        .sortBy { case (t, v) => (-v, t) }
        .map { case (t, v) => MGEntry(t, v) },
      merged.n)
  }

  /** One-pass sketch of a string column: driver gets the (tiny) summary. */
  def misraGries(df: DataFrame, column: String, k: Int): MGResult = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string")).as[String]
      .select(new MisraGries(k).toColumn).head()
  }

  /** EXACT heavy hitters via the two-pass sketch plan: (1) a map-only
    * Misra-Gries pass yields a summary whose survivors are a GUARANTEED
    * superset of every item with true count ≥ `minCount` (requires
    * minCount > n/(k+1), enforced at runtime — size k to the data); (2)
    * the exact pass counts ONLY the candidate tokens, broadcast
    * semi-joined against the stream, so the aggregation shuffle carries
    * candidate rows instead of the full distinct-token stream. Result is
    * identical to a plain GROUP BY + HAVING ≥ minCount (the q97 oracle)
    * — the sketch buys the plan shape, not approximation. */
  def heavyHitters(df: DataFrame, column: String, k: Int,
                   minCount: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sk = misraGries(df, column, k)
    val errBound = sk.n / (k + 1L)
    require(minCount > errBound,
      s"minCount=$minCount must exceed the sketch error bound n/(k+1)=" +
        s"$errBound (n=${sk.n}, k=$k) for the candidate set to be complete" +
        " — raise k or minCount")
    // survivors with est ≥ minCount − errBound can still reach minCount
    val candidates = sk.entries
      .filter(_.estimate >= minCount - errBound).map(_.token).toDF(column)
    df.select(col(column).cast("string").as(column))
      .join(broadcast(candidates), Seq(column), "left_semi")
      .groupBy(column).agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
  }
}
