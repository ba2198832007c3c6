package graft.sim

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Index-and-probe incremental ANN — the embeddings counterpart of
  * [[graft.text.IncrementalDedup]]: at 100 TB the steady state is not
  * "rescan the corpus per query batch" ([[Ivf.ivfTopKJoin]]'s shape,
  * right for one-shot batch jobs) but "assign the corpus to inverted
  * lists ONCE into a persisted index, then for each arriving query
  * batch compute only the batch's probe lists and join them against
  * the index" — and append newly-ingested vectors so the index stays
  * current without a rebuild.
  *
  * Index layout (via [[graft.sources.Bucketed]]): a managed parquet
  * table of (centroid, id, vn) rows — the inverted list id, the vector
  * id, and the L2-NORMALIZED vector — bucketed AND sorted on
  * `centroid`. That buys the two plans the incremental-dedup index
  * proved (IncrementalDedupSpec/IncrementalAnnSpec plan pins):
  *
  *   - the probe join needs no Exchange on the index side — the scan's
  *     HashPartitioning(centroid) satisfies the join's clustered
  *     distribution, so only the (small) batch's probe rows shuffle;
  *   - the batch's probed-centroid set — bounded by the CODEBOOK size,
  *     never the data — pushes down as an `isin` filter and Spark
  *     BUCKET-PRUNES the index scan: a single query reading nProbe of
  *     4096 lists touches only those buckets, sub-linear in the index.
  *     Unlike the dedup index's unbounded band-key domain (capped at
  *     512 pushed literals for planning cost), the centroid domain is
  *     the codebook — the pushdown is always cheap to plan.
  *
  * Storing vn in the index trades index bytes for probe work: the
  * exact re-rank needs the vector anyway, and materializing it beside
  * its list id at build time removes the co-partitioned vector fetch
  * join every probe would otherwise pay (the one extra scan
  * [[Ivf.ivfTopKJoin]] does). Vectors still never RIDE a shuffle — the
  * index side is Exchange-free; only the batch's (query, vector) rows
  * move, nProbe copies each.
  *
  * Works with any codebook; with [[Pinned.ivfCentroids]] the whole
  * build→probe pipeline is deterministic arithmetic the DuckDB oracle
  * replays end to end (q131 — the q113/q114/q115 doctrine), so the
  * incremental serving path is driver-verified even though trained
  * codebooks stay recall-gated.
  */
object IncrementalAnn {

  /** (centroid, id, vn) assignment rows — map-only against the
    * broadcast codebook, one pass over `vecs`. */
  private def assignedVectors(vecs: DataFrame,
                              cents: Array[Array[Double]]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    graft.sources.Tables.widen(vecs)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.map { case (id, v) =>
          var ss = 0.0
          var i = 0
          while (i < v.length) { ss += v(i) * v(i); i += 1 }
          val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
          val vn = v.map(_ * inv)
          (Ivf.nearestCentroid(vn, cs), id, vn)
        }
      }
      .toDF("centroid", "id", "vn")
  }

  /** Assign `corpus` against `cents` and (re)build the persistent
    * inverted-list table. One normalize+assign pass + one bucket-write
    * shuffle — paid once, not per probe. */
  def buildIndex(corpus: DataFrame, table: String, buckets: Int,
                 cents: Array[Array[Double]]): Unit =
    graft.sources.Bucketed.save(assignedVectors(corpus, cents),
      table, Seq("centroid"), buckets)

  /** Append newly-ingested vectors to the index (same bucket spec — the
    * bucketed-table contract keeps the co-located probe join valid).
    * The continuous-ingest half of the loop: probe a batch for
    * neighbours, then append it so later batches see it. */
  def appendToIndex(newVecs: DataFrame, table: String, buckets: Int,
                    cents: Array[Array[Double]]): Unit =
    graft.sources.Bucketed.save(assignedVectors(newVecs, cents),
      table, Seq("centroid"), buckets, mode = SaveMode.Append)

  /** Periodic maintenance for a continuously-appended index: rewrite
    * any inverted-list bucket that has accumulated more than
    * `maxFilesPerBucket` files into one sorted file (see
    * [[graft.sources.Bucketed.compactBuckets]]). Deduplication is ON —
    * the index is a SET of (centroid, id, vn) postings, and a
    * duplicated posting (at-least-once replay, interrupted compaction)
    * would otherwise occupy two slots of a probe's top-k window.
    * Returns the number of buckets rewritten. */
  def compactIndex(spark: SparkSession, table: String,
                   maxFilesPerBucket: Int = 4): Int =
    graft.sources.Bucketed.compactBuckets(spark, table, maxFilesPerBucket)

  /** Top-k cosine neighbours of each query vector via its nProbe
    * nearest inverted lists, WITHOUT rescanning or re-assigning the
    * corpus. Probe selection is map-only against the broadcast
    * codebook; the probed-centroid set (bounded driver state — at most
    * the codebook size) prunes the index scan; each (neighbor, centroid)
    * is unique so candidates need no dedup stage; exact re-rank uses
    * the codegen'd [[graft.expressions.DotE6]] over normalized vectors.
    * Output: (query_id, neighbor_id, cos_e6, rank) — the
    * [[Similarity.bruteForceTopK]]/[[Ivf.ivfTopK]] contract. */
  def probe(spark: SparkSession, queries: DataFrame, table: String,
            cents: Array[Array[Double]], k: Int,
            nProbe: Int = 8): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val probes = graft.sources.Tables.widen(queries)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.flatMap { case (id, v) =>
          var ss = 0.0
          var i = 0
          while (i < v.length) { ss += v(i) * v(i); i += 1 }
          val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
          val qn = v.map(_ * inv)
          cs.indices
            .map { c =>
              var dot = 0.0
              var d = 0
              val n = math.min(qn.length, cs(c).length)
              while (d < n) { dot += qn(d) * cs(c)(d); d += 1 }
              (c, dot)
            }
            .sortBy { case (c, d) => (-d, c) }
            .take(nProbe)
            .map { case (c, _) => (c, id, qn) }
        }
      }
      .toDF("centroid", "query_id", "qv")
      // feeds the centroid-set collect AND the join — assign once
      .localCheckpoint(eager = false)
    // probed-centroid pushdown: ≤ codebook-size literals, always cheap
    // to plan (contrast IncrementalDedup.probe's 512-key cap), and the
    // bucketed scan prunes to the probed lists' buckets
    val probed = probes.select("centroid").distinct()
      .as[Int].collect().sorted
    val idx = graft.sources.Bucketed.load(spark, table)
      .filter(col("centroid").isin(probed.toIndexedSeq: _*))
    val scored = idx.join(probes, Seq("centroid"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        graft.expressions.DotE6.col(col("qv"), col("vn")).as("cos_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
