package graft.sim

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the centroid
  * counterpart to the hyperplane-LSH path in [[Similarity]]: train a
  * small spherical k-means codebook, assign every corpus vector to its
  * nearest centroid (the "inverted list"), probe only the `nProbe`
  * closest lists per query, and exact-re-rank the candidates.
  *
  * Scale shape (the IVF promise at 100 TB):
  *   - the codebook is tiny and BROADCAST — assignment is map-only;
  *   - the probe join is an equi-join on `centroid` (shuffle bounded by
  *     list sizes, never all-pairs);
  *   - candidates are compact (query_id, centroid) / (centroid, id) keys;
  *     vectors are fetched by co-partitioned id-join exactly like the
  *     compact LSH layout.
  *
  * Determinism without RNG state (same discipline as
  * [[Similarity.hyperplane]]): initial centroids are the `nCentroids`
  * corpus vectors with the smallest ids, refined by `iters` Lloyd
  * rounds (assign by max dot over normalized vectors → renormalized
  * mean); ties break toward the lower centroid index. The codebook is
  * reproducible for a fixed partitioning; across different partition
  * counts the Lloyd sums commute only up to FP rounding (last-ulp
  * centroid jitter), which the exact re-rank absorbs — rankings are
  * computed from true cosines, never from the codebook.
  */
object Ivf {

  /** Normalized (id, vn) — shared vector-store shape (widened when a
    * single-file scan would bottleneck the map stages on one core). */
  private[sim] def normalized(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.sources.Tables.widen(df)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) =>
        var ss = 0.0
        var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
        (id, v.map(_ * inv))
      })
      .toDF(idAs, vecAs)
  }

  private[sim] def nearestCentroid(v: Array[Double],
                              cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, ct.length)
      while (i < n) { dot += v(i) * ct(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Deterministic spherical k-means codebook. Each Lloyd round is one
    * aggregation job over the corpus (assign map-side against the
    * broadcast codebook, partial sums combine); the codebook itself is
    * driver-resident model state (nCentroids × dim doubles).
    * An emptied centroid keeps its previous vector. */
  def trainCentroids(corpus: DataFrame, nCentroids: Int = 16,
                     iters: Int = 3): Array[Array[Double]] = {
    val norm = normalized(corpus, "id", "vn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainFromNormalized(norm, nCentroids, iters)
    finally norm.unpersist()
  }

  /** Lloyd rounds over an already-normalized (cached) corpus — the
    * classic k-means pattern: normalize + cache ONCE, re-scan the cached
    * vectors per iteration instead of re-reading + re-normalizing the
    * source every round. */
  private def trainFromNormalized(norm: DataFrame, nCentroids: Int,
                                  iters: Int): Array[Array[Double]] = {
    val spark = norm.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = norm.orderBy(norm.columns.head)
      .limit(nCentroids)
      .select(norm.columns(1)).as[Array[Double]].collect()
    require(cents.nonEmpty, "IVF training needs a non-empty corpus")
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val sums = norm.as[(Long, Array[Double])]
        .mapPartitions { rows =>
          val cs = bc.value
          rows.map { case (_, v) => (nearestCentroid(v, cs), (v, 1L)) }
        }
        .rdd
        .reduceByKey { (x: (Array[Double], Long), y: (Array[Double], Long)) =>
          val s = x._1.clone()
          var i = 0
          while (i < s.length && i < y._1.length) { s(i) += y._1(i); i += 1 }
          (s, x._2 + y._2)
        }
        .collect()
      val next = cents.clone()
      sums.foreach { case (c, (sum, n)) =>
        var ss = 0.0
        var i = 0
        while (i < sum.length) { ss += sum(i) * sum(i); i += 1 }
        val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
        next(c) = sum.map(_ * inv)
        val _ = n
      }
      cents = next
      it += 1
    }
    cents
  }

  /** (id, centroid) inverted-list assignment — map-only against the
    * broadcast codebook. */
  def assignments(corpus: DataFrame, cents: Array[Array[Double]],
                  idAs: String = "id"): DataFrame =
    assignFromNormalized(normalized(corpus, "id", "vn"), cents, idAs)

  private def assignFromNormalized(norm: DataFrame,
                                   cents: Array[Array[Double]],
                                   idAs: String): DataFrame = {
    val spark = norm.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    norm.as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.map { case (id, v) => (id, nearestCentroid(v, cs)) }
      }
      .toDF(idAs, "centroid")
  }

  /** Session-scoped LRU of persisted normalized corpora, keyed by the
    * canonicalized corpus plan: the cache must outlive the lazy DataFrame
    * ivfTopK returns, so it cannot be unpersisted eagerly — but repeated
    * calls over the same corpus now reuse ONE MEMORY_AND_DISK copy, and
    * calls over more than `max` distinct corpora unpersist the
    * least-recently-used copy instead of accumulating until eviction. */
  private object NormCache {
    private val max = 4
    private val entries =
      new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true)
    def getOrElseUpdate(key: String, make: => DataFrame): DataFrame =
      synchronized {
        val hit = entries.get(key)
        if (hit != null) hit
        else {
          val df = make
          entries.put(key, df)
          if (entries.size > max) {
            val it = entries.entrySet().iterator()
            val oldest = it.next()
            oldest.getValue.unpersist()
            it.remove()
          }
          df
        }
      }
  }

  /** Cache key for a corpus plan. The canonicalized plan alone is NOT
    * enough: Spark canonicalization normalizes a parquet relation to
    * `Relation [none#0L,...] parquet` with NO path, so two different
    * corpora with the same schema would collide — include every file
    * relation's root paths explicitly. */
  private[sim] def planKey(df: DataFrame): String = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val paths = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
        case other => other.toString
      }
    }.mkString(";")
    System.identityHashCode(df.sparkSession) + "\n" + paths + "\n" +
      df.queryExecution.analyzed.canonicalized.toString
  }

  private[sim] def cachedCorpusNorm(corpus: DataFrame): DataFrame =
    NormCache.getOrElseUpdate(planKey(corpus),
      normalized(corpus, "neighbor_id", "cv")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Session-scoped codebook cache: IVF's model is train-once /
    * serve-many — retraining identical Lloyd rounds on an unchanged
    * corpus for every query batch would pay `iters` full corpus scans
    * per call. Keyed by ([[planKey]] incl. source paths, nCentroids,
    * iters); driver-resident (nCentroids × dim doubles, a few KB each),
    * LRU-bounded so long sessions over many corpora don't accumulate. */
  private object CodebookCache {
    private val max = 16
    private val entries =
      new java.util.LinkedHashMap[String, Array[Array[Double]]](32, 0.75f, true)
    def getOrElseUpdate(key: String,
                        make: => Array[Array[Double]]): Array[Array[Double]] =
      synchronized {
        val hit = entries.get(key)
        if (hit != null) hit
        else {
          val v = make
          entries.put(key, v)
          if (entries.size > max) {
            val it = entries.entrySet().iterator()
            it.next(); it.remove()
          }
          v
        }
      }
  }

  private[sim] def cachedCodebook(corpusNorm: DataFrame, nCentroids: Int,
                             iters: Int): Array[Array[Double]] =
    CodebookCache.getOrElseUpdate(
      nCentroids + ":" + iters + "\n" + planKey(corpusNorm),
      trainFromNormalized(corpusNorm, nCentroids, iters))

  /** Top-k cosine neighbours per query via nProbe inverted lists — the
    * small-query *serving* fast path (same design as
    * [[Similarity.lshTopKBroadcast]]): queries are collected, their
    * nProbe probe lists computed driver-side against the codebook, and
    * the (codebook, centroid→queries index) pair is broadcast; the
    * cached normalized corpus is then scanned ONCE, each row assigned
    * its centroid and scored against exactly the queries probing that
    * centroid, map-side. The only exchange is the final top-k window
    * (WindowGroupLimit-pruned). No dedup stage is needed: one centroid
    * per corpus row × distinct (query, centroid) probes ⇒ unique pairs.
    *
    * NOTE eager: runs the training jobs and one small query collect at
    * composition time. For corpus-sized query sets use [[ivfTopKJoin]].
    * Output: (query_id, neighbor_id, cos_e6, rank) — same contract as
    * [[Similarity.lshTopK]]/[[Similarity.bruteForceTopK]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 8,
              iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusNorm = cachedCorpusNorm(corpus)
    val cents = cachedCodebook(corpusNorm, nCentroids, iters)
    // driver-side probe index: centroid -> [(query_id, normalized qv)] —
    // the same nearest-centroid ordering ((-dot, index) sort) as the
    // distributed probe pass in ivfTopKJoin
    val qRows = normalized(queries, "query_id", "qv")
      .as[(Long, Array[Double])].collect()
    val probeIdx = new java.util.HashMap[Int, Array[(Long, Array[Double])]]()
    qRows.foreach { case (qid, qn) =>
      cents.indices
        .map { c =>
          var dot = 0.0
          var i = 0
          val n = math.min(qn.length, cents(c).length)
          while (i < n) { dot += qn(i) * cents(c)(i); i += 1 }
          (c, dot)
        }
        .sortBy { case (c, d) => (-d, c) }
        .take(nProbe)
        .foreach { case (c, _) =>
          probeIdx.put(c,
            Option(probeIdx.get(c)).getOrElse(Array.empty) :+ ((qid, qn)))
        }
    }
    val bcCents = spark.sparkContext.broadcast(cents)
    val bcProbes = spark.sparkContext.broadcast(probeIdx)
    val scored = corpusNorm
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bcCents.value
        val idx = bcProbes.value
        rows.flatMap { case (cid, cvn) =>
          val hits = idx.get(nearestCentroid(cvn, cs))
          if (hits == null) Iterator.empty
          else hits.iterator.collect { case (qid, qn) if qid != cid =>
            var dot = 0.0
            var d = 0
            val n = math.min(qn.length, cvn.length)
            while (d < n) { dot += qn(d) * cvn(d); d += 1 }
            (qid, cid, math.floor(dot * 1000000.0).toLong)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cos_e6")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Symmetric compact-join IVF — the path for query sets too large to
    * broadcast: distributed probe selection, equi-join on `centroid`,
    * candidate dedup, co-partitioned vector fetch, exact re-rank. Same
    * output contract and identical rows to [[ivfTopK]] (parity
    * scalatested). */
  def ivfTopKJoin(queries: DataFrame, corpus: DataFrame, k: Int,
                  nCentroids: Int = 16, nProbe: Int = 8,
                  iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // normalize + cache the corpus ONCE — training (iters jobs), the
    // inverted-list assignment, and the vector fetch all reuse it
    val corpusNorm = cachedCorpusNorm(corpus)
    val cents = cachedCodebook(corpusNorm, nCentroids, iters)
    val bc = spark.sparkContext.broadcast(cents)
    // one normalized pass over the (small) query side, reused for probe
    // selection and the re-rank fetch
    val qNorm = normalized(queries, "query_id", "qv")
    // query → its nProbe nearest centroids (compact (query_id, centroid))
    val probes = qNorm
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.flatMap { case (id, v) =>
          cs.indices
            .map { c =>
              var dot = 0.0
              var i = 0
              val n = math.min(v.length, cs(c).length)
              while (i < n) { dot += v(i) * cs(c)(i); i += 1 }
              (c, dot)
            }
            .sortBy { case (c, d) => (-d, c) }
            .take(nProbe)
            .map { case (c, _) => (id, c) }
        }
      }
      .toDF("query_id", "centroid")
    val lists = assignFromNormalized(corpusNorm, cents, idAs = "neighbor_id")
    val cand = probes.join(lists, Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    // vector fetch + exact re-rank: native codegen'd dot
    // (graft.expressions.DotE6), same summation order as the oracle
    val scored = cand
      .join(qNorm, Seq("query_id"))
      .join(corpusNorm, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expressions.DotE6.col(col("qv"), col("cv")).as("cos_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
