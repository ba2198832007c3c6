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
  */
object Sketch {

  /** Summary state: counters plus the processed-item total (the total
    * makes the error bound n/(k+1) computable by the caller). */
  final case class MGSummary(counters: Map[String, Long], n: Long)

  /** Output entry: token with its under-estimate. */
  final case class MGEntry(token: String, estimate: Long)

  final case class MGResult(entries: Seq[MGEntry], n: Long)

  /** Misra-Gries aggregator over a string column with `k` counters. */
  final class MisraGries(k: Int)
      extends Aggregator[String, MGSummary, MGResult] {
    require(k >= 1, "k must be >= 1")

    override def zero: MGSummary = MGSummary(Map.empty, 0L)

    override def reduce(b: MGSummary, tok: String): MGSummary = {
      val c = b.counters
      if (c.contains(tok))
        MGSummary(c.updated(tok, c(tok) + 1L), b.n + 1)
      else if (c.size < k)
        MGSummary(c.updated(tok, 1L), b.n + 1)
      else {
        // decrement-all step: drop a unit from every counter (and the
        // unseen token's implicit counter) — k+1 distinct items each
        // lose one, which is where the n/(k+1) bound comes from
        val dec = c.iterator
          .map { case (t, v) => (t, v - 1L) }
          .filter(_._2 > 0L).toMap
        MGSummary(dec, b.n + 1)
      }
    }

    override def merge(a: MGSummary, b: MGSummary): MGSummary = {
      val merged = (a.counters.keySet ++ b.counters.keySet).iterator
        .map { t =>
          t -> (a.counters.getOrElse(t, 0L) + b.counters.getOrElse(t, 0L))
        }.toMap
      val trimmed =
        if (merged.size <= k) merged
        else {
          val kth = merged.values.toSeq.sorted(Ordering[Long].reverse)(k)
          merged.iterator
            .map { case (t, v) => (t, v - kth) }
            .filter(_._2 > 0L).toMap
        }
      MGSummary(trimmed, a.n + b.n)
    }

    override def finish(r: MGSummary): MGResult =
      MGResult(
        r.counters.toSeq
          .sortBy { case (t, v) => (-v, t) }
          .map { case (t, v) => MGEntry(t, v) },
        r.n)

    override def bufferEncoder: Encoder[MGSummary] = Encoders.product
    override def outputEncoder: Encoder[MGResult] = Encoders.product
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
