package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Signed random projection (SRP / hyperplane LSH, Charikar 2002): a
  * compact bit signature per embedding where bit j is the sign of the
  * dot product with pseudo-random hyperplane j. Signatures preserve
  * angular similarity (P[bit match] = 1 - theta/pi), so equal or
  * near-equal signatures are the candidate buckets for cosine near-dup
  * at corpus scale — the embedding-space analogue of MinHash banding.
  *
  * Determinism design (same doctrine as the MinHash/SimHash operators):
  *   - hyperplane component (j, d) is +1/-1 by parity of
  *     polyhash("j:d") — no RNG, any engine can regenerate it;
  *   - vector components are floor-quantized to integers (x_e6 =
  *     floor(double(x) * 1e6)) BEFORE the dot product, so the per-plane
  *     sum is integer arithmetic — independent of addition order and
  *     bit-identical across engines (a float dot could differ in the
  *     last ulp between engines; the q99 oracle replays this in SQL and
  *     hash-matches).
  *
  * Scale shape: the sketch is MAP-ONLY (one pass over the corpus, no
  * shuffle, no model state — the "hyperplanes" are a pure hash
  * function). Downstream, grouping by `srp` buckets candidates exactly
  * like [[Similarity]]'s LSH path; a 100 TB corpus sketches in one scan.
  * Signature math runs in compiled partition-local Scala (typed map),
  * not interpreted higher-order Column lambdas — see the Dedup scaladoc
  * for why that matters.
  */
object Srp {

  /** Hyperplane component for (plane j, 0-based dim d): +1 or -1 by the
    * midpoint threshold of the square-mixed polyhash of "j:d" — the
    * oracle regenerates the same matrix in SQL. NOT raw parity and not
    * an affine mix: both leave the sign matrix rank-degenerate for
    * index-pair inputs (see [[Hashing.squareMix]]); SrpSpec pins the
    * row correlations at the random baseline. */
  def sign(j: Int, d: Int): Long =
    if (Hashing.squareMix(Hashing.polyHash(s"$j:$d")) * 2 < Hashing.P) 1L
    else -1L

  /** Sketch every embedding: (id, srp) with an `planes`-bit signature
    * (bit j = 1 iff sum_d floor(v[d]*1e6) * sign(j,d) >= 0). */
  def sketch(emb: DataFrame, planes: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding",
             maxDims: Int = 4096): DataFrame = {
    require(planes >= 1 && planes <= 62, "planes must be in [1, 62]")
    val spark = emb.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Float])] =
      graft.sources.Tables.widen(
          emb.select(col(idCol).cast("long"), col(vecCol)))
        .as[(Long, Array[Float])]
    ds.mapPartitions { it =>
        // sign matrix built ONCE per partition, sized to the vectors
        // actually seen (building it driver-side at maxDims would ship
        // planes x maxDims longs — half an MB at 4096 — in every task
        // closure, mostly unused)
        val signs = new SignCache(planes, maxDims)
        it.map { case (id, v) =>
          val xi = new Array[Long](v.length)
          var d = 0
          while (d < v.length) {
            xi(d) = math.floor(v(d).toDouble * 1e6).toLong
            d += 1
          }
          val s = signs.upTo(v.length)
          var sig = 0L
          var j = 0
          while (j < planes) {
            val sj = s(j)
            var dot = 0L
            var i = 0
            while (i < xi.length) { dot += xi(i) * sj(i); i += 1 }
            if (dot >= 0L) sig |= (1L << j)
            j += 1
          }
          (id, sig)
        }
      }
      .toDF(idCol, "srp")
  }

  /** Partition-local lazily-grown sign matrix: rows are planes, columns
    * grow (doubling) to the widest vector seen. Identical values to
    * [[sign]] — just computed executor-side instead of shipped. */
  private final class SignCache(planes: Int, maxDims: Int) {
    private var dims = 0
    private var m: Array[Array[Long]] = Array.fill(planes)(Array.emptyLongArray)
    def upTo(n: Int): Array[Array[Long]] = {
      require(n <= maxDims, s"embedding has $n dims > maxDims $maxDims")
      if (n > dims) {
        val target = math.min(maxDims, math.max(n, math.max(64, dims * 2)))
        m = Array.tabulate(planes) { j =>
          val row = new Array[Long](target)
          System.arraycopy(m(j), 0, row, 0, dims)
          var d = dims
          while (d < target) { row(d) = sign(j, d); d += 1 }
          row
        }
        dims = target
      }
      m
    }
  }

  /** Bucket census of a sketch: (srp, n_vectors) — the skew pre-flight
    * for SRP-bucketed candidate joins (same role as Profile.keySkew). */
  def bucketSizes(sketched: DataFrame): DataFrame =
    sketched.groupBy("srp").agg(count(lit(1)).as("n_vectors"))

  /** DENSE random projection (Achlioptas 2003: +-1 entries suffice for
    * the Johnson-Lindenstrauss guarantee): reduce each embedding to
    * `outDims` integer components y[j] = sum_d floor(v[d]*1e6) *
    * sign(j,d) — the same deterministic hyperplanes and quantization as
    * [[sketch]], but keeping the magnitudes instead of the sign bit.
    * This is the cheap embedding-compression step (64d float -> 16d
    * int) that an ANN pre-filter or a disk-tier index stores; distances
    * in the projected space approximate original distances to within
    * the JL distortion (SrpSpec checks the correlation on real
    * fixtures).
    *
    * Output is LONG format (id, j, y_e6) — one row per output
    * component, so the result is oracle-comparable and join-friendly;
    * pivot back with groupBy(id).pivot(j) if an array column is wanted.
    * Map-only like the sketch: no shuffle, no model state. */
  def project(emb: DataFrame, outDims: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding",
              maxDims: Int = 4096): DataFrame = {
    require(outDims >= 1, "outDims must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    graft.sources.Tables.widen(
        emb.select(col(idCol).cast("long"), col(vecCol)))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val signs = new SignCache(outDims, maxDims)
        it.flatMap { case (id, v) =>
          val xi = new Array[Long](v.length)
          var d = 0
          while (d < v.length) {
            xi(d) = math.floor(v(d).toDouble * 1e6).toLong
            d += 1
          }
          val s = signs.upTo(v.length)
          (0 until outDims).map { j =>
            val sj = s(j)
            var dot = 0L
            var i = 0
            while (i < xi.length) { dot += xi(i) * sj(i); i += 1 }
            (id, j.toLong, dot)
          }
        }
      }
      .toDF(idCol, "j", "y_e6")
  }
}
