package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the vector-store compression that makes
  * ANN serving feasible at 100 TB. Each normalized vector is split into
  * `m` subvectors; every subspace gets its own `ksub`-centroid k-means
  * codebook; a vector is stored as `m` small codes (m·log2(ksub) bits —
  * e.g. 16 subspaces × 32 centroids = 80 bits vs 256 bytes of float32,
  * a 25× reduction). Query scoring is ADC (asymmetric distance
  * computation): the query precomputes one m×ksub lookup table of
  * subspace dot products, and scoring a stored vector is m table adds —
  * no float vector is touched until the exact re-rank of the shortlist.
  *
  * Scale shape mirrors [[Ivf]]: training is `iters` aggregation jobs
  * over the corpus (ALL m subspaces learned in the same job — keys are
  * (subspace, centroid) pairs — not m separate scans); codebooks are
  * bounded driver-resident model state (m × ksub × dim/m doubles);
  * encoding and ADC scoring are map-only against the broadcast model;
  * the only exchanges are the shortlist top-k window and the compact
  * id-join that fetches full vectors for re-ranking.
  *
  * Determinism: codebook init is the first `ksub` corpus rows by id;
  * Lloyd updates aggregate float sums (like [[Ivf]], combine order is
  * partition-dependent), so PQ results are gated by recall specs and
  * registered rows-only, not hash-compared.
  */
object Pq {

  /** Codebooks: codebooks(s)(c) = centroid c of subspace s (dim/m
    * doubles). Plain nested arrays so the broadcast is compact. */
  type Codebooks = Array[Array[Array[Double]]]

  private[sim] def sliceBounds(dim: Int, m: Int): Array[(Int, Int)] = {
    // first (dim % m) subspaces get the extra element when m ∤ dim
    val base = dim / m
    val extra = dim % m
    val out = new Array[(Int, Int)](m)
    var start = 0
    var s = 0
    while (s < m) {
      val len = base + (if (s < extra) 1 else 0)
      out(s) = (start, start + len)
      start += len
      s += 1
    }
    out
  }

  private[sim] def nearestSub(v: Array[Double], lo: Int, hi: Int,
                              cents: Array[Array[Double]]): Int = {
    // argmin_c ||v[lo,hi) - c||^2 = argmin_c (||c||^2 - 2 v·c); compute
    // the dot form so centroids' norms amortize — here inline both terms
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0.0
      var i = lo
      var j = 0
      while (i < hi && j < ct.length) {
        val diff = v(i) - ct(j); d += diff * diff; i += 1; j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Lloyd training over an already-normalized (id, vec) corpus: one
    * aggregation job per round for all subspaces. */
  private[sim] def trainFromNormalized(norm: DataFrame, m: Int, ksub: Int,
                                       iters: Int): Codebooks = {
    val spark = norm.sparkSession
    import spark.implicits._
    val seed = norm.orderBy(norm.columns.head).limit(ksub)
      .select(norm.columns(1)).as[Array[Double]].collect()
    require(seed.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = seed.head.length
    val bounds = sliceBounds(dim, m)
    var books: Codebooks = Array.tabulate(m) { s =>
      val (lo, hi) = bounds(s)
      // init centroid c of subspace s = subvector of seed row (c mod n)
      Array.tabulate(ksub)(c => seed(c % seed.length).slice(lo, hi))
    }
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast((books, bounds))
      val sums = norm.as[(Long, Array[Double])]
        .mapPartitions { rows =>
          val (bks, bds) = bc.value
          rows.flatMap { case (_, v) =>
            bds.indices.iterator.map { s =>
              val (lo, hi) = bds(s)
              val c = nearestSub(v, lo, hi, bks(s))
              ((s, c), (v.slice(lo, hi), 1L))
            }
          }
        }
        .rdd
        .reduceByKey { (x, y) =>
          val sArr = x._1.clone()
          var i = 0
          while (i < sArr.length && i < y._1.length) { sArr(i) += y._1(i); i += 1 }
          (sArr, x._2 + y._2)
        }
        .collect()
      val next = books.map(_.clone())
      sums.foreach { case ((s, c), (sum, n)) =>
        if (n > 0) next(s)(c) = sum.map(_ / n)
      }
      books = next
      it += 1
    }
    books
  }

  def trainCodebooks(corpus: DataFrame, m: Int = 16, ksub: Int = 32,
                     iters: Int = 3): Codebooks = {
    val norm = Ivf.normalized(corpus, "id", "vn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainFromNormalized(norm, m, ksub, iters)
    finally norm.unpersist()
  }

  /** Session-scoped train-once/serve-many codebook cache (the [[Ivf]]
    * pattern): keyed by corpus plan + params, LRU-bounded. */
  private object PqCache {
    private val max = 16
    private val entries =
      new java.util.LinkedHashMap[String, Codebooks](32, 0.75f, true)
    def getOrElseUpdate(key: String, make: => Codebooks): Codebooks =
      synchronized {
        val hit = entries.get(key)
        if (hit != null) hit
        else {
          val v = make
          entries.put(key, v)
          if (entries.size > max) {
            val it = entries.entrySet().iterator(); it.next(); it.remove()
          }
          v
        }
      }
  }

  private def cachedCodebooks(corpusNorm: DataFrame, m: Int, ksub: Int,
                              iters: Int): Codebooks =
    PqCache.getOrElseUpdate(
      s"$m:$ksub:$iters\n" + Ivf.planKey(corpusNorm),
      trainFromNormalized(corpusNorm, m, ksub, iters))

  /** The train-once/serve-many codebooks for a corpus (cached) — the
    * model handle shared between [[encode]] (build the codes table) and
    * [[adcTopKFromCodes]] (serve from it). */
  def codebooksFor(corpus: DataFrame, m: Int = 16, ksub: Int = 32,
                   iters: Int = 3): Codebooks =
    cachedCodebooks(Ivf.cachedCorpusNorm(corpus), m, ksub, iters)

  /** Map-only PQ encoding: (id, codes array<int> of length m). This is
    * the persisted vector-store representation — m·log2(ksub) bits per
    * vector once written as packed bytes. */
  def encode(corpus: DataFrame, books: Codebooks): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = books.map(_.head.length).sum
    val bounds = sliceBounds(dim, books.length)
    val bc = spark.sparkContext.broadcast((books, bounds))
    Ivf.normalized(corpus, "id", "vn").as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val (bks, bds) = bc.value
        rows.map { case (id, v) =>
          (id, Array.tabulate(bds.length) { s =>
            val (lo, hi) = bds(s); nearestSub(v, lo, hi, bks(s))
          })
        }
      }
      .toDF("id", "codes")
  }

  /** Top-k cosine neighbours served from PQ codes: ONE scan of the
    * cached normalized corpus encodes each row and scores every query
    * with m lookup-table adds (the float vector is read for encoding
    * here because this serving path works straight off the raw corpus;
    * a deployment would persist [[encode]]'s codes and scan those — 25×
    * less I/O). The ADC shortlist (rerankFactor·k per query) is then
    * re-ranked exactly: compact (query_id, neighbor_id) candidates only,
    * vectors fetched by co-partitioned id-join, same DotE6/summation
    * order as every other ANN path so rankings are comparable.
    * Output: (query_id, neighbor_id, cos_e6, rank). */
  def adcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              m: Int = 16, ksub: Int = 32, iters: Int = 3,
              rerankFactor: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusNorm = Ivf.cachedCorpusNorm(corpus) // (neighbor_id, cv)
    val books = cachedCodebooks(corpusNorm, m, ksub, iters)
    val bounds = sliceBounds(books.map(_.head.length).sum, m)
    val qRows = Ivf.normalized(queries, "query_id", "qv")
      .as[(Long, Array[Double])].collect()
    val luts = qRows.map { case (qid, qv) => (qid, buildLut(qv, books, bounds)) }
    val bc = spark.sparkContext.broadcast((books, bounds, luts))
    val kSub = ksub
    val adc = corpusNorm.as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val (bks, bds, qs) = bc.value
        val mm = bds.length
        rows.flatMap { case (cid, cv) =>
          // encode once per corpus row, score all queries off the codes
          val codes = new Array[Int](mm)
          var s = 0
          while (s < mm) {
            val (lo, hi) = bds(s); codes(s) = nearestSub(cv, lo, hi, bks(s))
            s += 1
          }
          qs.iterator.collect { case (qid, lut) if qid != cid =>
            var score = 0.0
            var t = 0
            while (t < mm) { score += lut(t * kSub + codes(t)); t += 1 }
            (qid, cid, math.floor(score * 1000000.0).toLong)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "adc_e6")
    rerankShortlist(adc, qRows, corpusNorm, k, rerankFactor)
  }

  /** Per-query ADC lookup table: lut(s*ksub + c) = q_sub(s) · books(s)(c).
    * ONE implementation shared by every serving path — the scoring
    * contract must not diverge between the float-scan, codes-table, and
    * IVF-probed variants (PqSpec pins their equality pairwise). */
  private def buildLut(qv: Array[Double], books: Codebooks,
                       bounds: Array[(Int, Int)]): Array[Double] = {
    val m = books.length
    val ksub = books.head.length
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val (lo, hi) = bounds(s)
      var c = 0
      while (c < ksub) {
        val ct = books(s)(c)
        var dot = 0.0
        var i = lo
        var j = 0
        while (i < hi && j < ct.length) { dot += qv(i) * ct(j); i += 1; j += 1 }
        lut(s * ksub + c) = dot
        c += 1
      }
      s += 1
    }
    lut
  }

  /** ADC shortlist → exact re-rank on full vectors (compact candidate
    * ids only cross the wire; vectors come from the cached corpus).
    * Takes the ALREADY-normalized, collected query rows — the callers
    * collected them for LUT construction, so re-running the
    * normalization job here would be a redundant scan. */
  private def rerankShortlist(adc: DataFrame,
                              qRows: Array[(Long, Array[Double])],
                              corpusNorm: DataFrame, k: Int,
                              rerankFactor: Int): DataFrame = {
    val spark = corpusNorm.sparkSession
    import spark.implicits._
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_e6").desc, col("neighbor_id").asc)
    val shortlist = adc.withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= math.max(k, rerankFactor * k))
      .select("query_id", "neighbor_id")
    val qNorm = qRows.toSeq.toDF("query_id", "qv")
    val scored = shortlist
      .join(qNorm, Seq("query_id"))
      .join(corpusNorm, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expressions.DotE6.col(col("qv"), col("cv")).as("cos_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Serve top-k from a PERSISTED codes table ([[encode]]'s output) —
    * the deployment shape PQ exists for: the scan reads m ints per
    * vector (25× less I/O than float32 at the default params), scores
    * them with ADC table adds, and only the shortlist's ids fetch full
    * vectors for the exact re-rank. `corpus` supplies those re-rank
    * vectors (compact id-join); the bulk scan never touches them.
    * Pass the same [[codebooksFor]] handle used to build the codes.
    * Output: (query_id, neighbor_id, cos_e6, rank). */
  def adcTopKFromCodes(queries: DataFrame, codes: DataFrame,
                       books: Codebooks, corpus: DataFrame, k: Int,
                       rerankFactor: Int = 10): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val m = books.length
    val ksub = books.head.length
    val bounds = sliceBounds(books.map(_.head.length).sum, m)
    val qRows = Ivf.normalized(queries, "query_id", "qv")
      .as[(Long, Array[Double])].collect()
    val luts = qRows.map { case (qid, qv) => (qid, buildLut(qv, books, bounds)) }
    val bc = spark.sparkContext.broadcast(luts)
    val kSub = ksub
    val adc = codes.select(col("id").cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .mapPartitions { rows =>
        val qs = bc.value
        rows.flatMap { case (cid, cs) =>
          qs.iterator.collect { case (qid, lut) if qid != cid =>
            var score = 0.0
            var t = 0
            while (t < cs.length) { score += lut(t * kSub + cs(t)); t += 1 }
            (qid, cid, math.floor(score * 1000000.0).toLong)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "adc_e6")
    rerankShortlist(adc, qRows, Ivf.cachedCorpusNorm(corpus), k,
      rerankFactor)
  }

  /** ADC serving against a PINNED literal codebook ([[Pinned.pqBooks]])
    * — the hash-checked companion to [[adcTopK]]: trained codebooks have
    * no SQL form, but with the codebook fixed, per-subspace code
    * assignment and lookup-table scoring are plain arithmetic the DuckDB
    * oracle replays bit-for-bit. Integer-exact doctrine: each
    * per-subspace LUT dot is floor-quantized to e6 BEFORE the
    * cross-subspace sum, so the aggregation is an order-free BIGINT sum
    * (the trained path sums doubles then floors — fine for serving,
    * not for cross-engine hashing).
    *
    * Declarative scale shape: map-only [[encode]], posexplode to
    * (s, code) rows, ONE broadcast join against the (query, s, code)
    * LUT, partial-agg integer sum, WindowGroupLimit top-k — candidate
    * rows carry ~24 bytes, never a float vector. */
  def pinnedAdcTopK(queries: DataFrame, corpus: DataFrame,
                    books: Codebooks, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = books.length
    val ksub = books.head.length
    val bounds = sliceBounds(books.map(_.head.length).sum, m)
    val ex = encode(corpus, books)
      .select(col("id").as("neighbor_id"),
        posexplode(col("codes")).as(Seq("s", "code")))
    val qRows = Ivf.normalized(queries, "query_id", "qv")
      .as[(Long, Array[Double])].collect()
    val lutRows = for {
      (qid, qv) <- qRows.toSeq
      s <- 0 until m
      c <- 0 until ksub
    } yield {
      val (lo, hi) = bounds(s)
      val ct = books(s)(c)
      var dot = 0.0
      var i = lo
      var j = 0
      while (i < hi && j < ct.length) { dot += qv(i) * ct(j); i += 1; j += 1 }
      (qid, s, c, math.floor(dot * 1000000.0).toLong)
    }
    val lut = lutRows.toDF("query_id", "s", "code", "lut_e6")
    val scored = ex.join(broadcast(lut), Seq("s", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("lut_e6").as("adc_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF+PQ — the canonical billion-vector serving architecture: the
    * coarse IVF codebook restricts scoring to the nProbe inverted lists
    * each query probes, and within those lists vectors are scored from
    * PQ codes with ADC table adds. One scan of the cached corpus: each
    * row is assigned its coarse centroid, PQ-encoded once, and scored
    * ONLY against the queries probing that centroid — cost scales with
    * nProbe/nCentroids of the ADC full scan, compounded with the 25×
    * code compression. Shortlist re-ranks exactly like [[adcTopK]].
    * (PQ here encodes the raw normalized vector, not the IVF residual —
    * the residual refinement changes recall, not the distributed shape.)
    * Output: (query_id, neighbor_id, cos_e6, rank). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 8,
                m: Int = 16, ksub: Int = 32, iters: Int = 3,
                rerankFactor: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val corpusNorm = Ivf.cachedCorpusNorm(corpus)
    val coarse = Ivf.cachedCodebook(corpusNorm, nCentroids, iters)
    val books = cachedCodebooks(corpusNorm, m, ksub, iters)
    val bounds = sliceBounds(books.map(_.head.length).sum, m)
    // driver-side probe index: coarse centroid -> queries probing it,
    // each with its precomputed ADC lookup table
    val qRows = Ivf.normalized(queries, "query_id", "qv")
      .as[(Long, Array[Double])].collect()
    val probeIdx = new java.util.HashMap[Int, Array[(Long, Array[Double])]]()
    qRows.foreach { case (qid, qv) =>
      val lut = buildLut(qv, books, bounds)
      coarse.indices
        .map { c =>
          var dot = 0.0
          var i = 0
          val n = math.min(qv.length, coarse(c).length)
          while (i < n) { dot += qv(i) * coarse(c)(i); i += 1 }
          (c, dot)
        }
        .sortBy { case (c, d) => (-d, c) }
        .take(nProbe)
        .foreach { case (c, _) =>
          probeIdx.put(c,
            Option(probeIdx.get(c)).getOrElse(Array.empty) :+ ((qid, lut)))
        }
    }
    val bc = spark.sparkContext.broadcast((coarse, books, bounds, probeIdx))
    val kSub = ksub
    val adc = corpusNorm.as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val (crs, bks, bds, idx) = bc.value
        val mm = bds.length
        rows.flatMap { case (cid, cv) =>
          val hits = idx.get(Ivf.nearestCentroid(cv, crs))
          if (hits == null) Iterator.empty
          else {
            val codes = new Array[Int](mm)
            var s = 0
            while (s < mm) {
              val (lo, hi) = bds(s); codes(s) = nearestSub(cv, lo, hi, bks(s))
              s += 1
            }
            hits.iterator.collect { case (qid, lut) if qid != cid =>
              var score = 0.0
              var t = 0
              while (t < mm) { score += lut(t * kSub + codes(t)); t += 1 }
              (qid, cid, math.floor(score * 1000000.0).toLong)
            }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "adc_e6")
    rerankShortlist(adc, qRows, corpusNorm, k, rerankFactor)
  }
}
