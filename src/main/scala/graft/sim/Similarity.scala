package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the scale path.
  *
  * Numeric discipline: dot products are computed left-to-right in double
  * (zip_with + aggregate — sequential IEEE adds, so any engine that sums
  * in list order reproduces them bit-for-bit), and similarities are
  * quantized to ×1e6 bigints BEFORE ranking, so rankings and outputs are
  * engine-stable (ties broken by neighbor id).
  *
  * Scale design (100 TB): brute-force is a broadcast of the (small) query
  * set against a partitioned corpus — a map-side loop, no shuffle until the
  * per-query top-k aggregate. The LSH variant buckets both sides by
  * hyperplane sign pattern; candidate generation is an equi-join on the
  * bucket key (shuffle on buckets, never an all-pairs product). IVF would
  * swap the bucket key for a nearest-centroid id — same join shape.
  */
object Similarity {

  /** Sequential dot product of two array<double> columns. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** L2 norm. */
  def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Cosine similarity quantized to ×1e6 bigint. */
  def cosineScaledCol(a: Column, b: Column): Column =
    floor(dotCol(a, b) / (normCol(a) * normCol(b)) * lit(1000000.0d)).cast("long")

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec: array<float>). Queries are broadcast
    * (assumed small); corpus stays partitioned (widened when a
    * single-file scan would run the |q|x|corpus| loop on one core).
    * Output: (query_id, neighbor_id, cos_e6, rank). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // collected + broadcast query side (the bruteForce contract assumes
    // a small query set); ONE corpus scan scores every query per row in
    // primitive double[] — no BNLJ machinery, no per-pair Seq boxing.
    // Operation order (dot left-to-right over min length, then each
    // norm over full length) is IDENTICAL to cosineScaledCol and to the
    // DuckDB oracle's list_reduce, so results stay bit-exact.
    val qRows = queries
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    val bc = spark.sparkContext.broadcast(qRows)
    val scored = graft.sources.Tables.widen(corpus)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val qs = bc.value
        rows.flatMap { case (cid, cv) =>
          var nb = 0.0
          var i = 0
          while (i < cv.length) { nb += cv(i) * cv(i); i += 1 }
          qs.iterator.collect { case (qid, qv) if qid != cid =>
            var dot = 0.0
            var na = 0.0
            val n = math.min(qv.length, cv.length)
            var j = 0
            while (j < n) { dot += qv(j) * cv(j); j += 1 }
            j = 0
            while (j < qv.length) { na += qv(j) * qv(j); j += 1 }
            (qid, cid,
              math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0).toLong)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cos_e6")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: component h[p][d] derived
    * from the portable hash of "p:d", mapped to [-1, 1). Reproducible in
    * any engine (and in tests) without RNG state. */
  def hyperplane(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      Hashing.polyHash(s"$p:$d").toDouble / Hashing.P * 2.0 - 1.0
    }

  /** Sign-pattern bucket key for a vector under `planes` hyperplanes. */
  def bucketKeyCol(vec: Column, planes: Seq[Array[Double]]): Column =
    concat_ws("", planes.map { pl =>
      val proj = aggregate(
        zip_with(vec, array(pl.map(lit): _*), (x, w) => x * w),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Embedding-cosine near-duplicate pairs with a blocking key: pairs
    * within the same block whose cosine ≥ threshold — the classic
    * blocked-dedup shape (block = label/shard/LSH bucket). The join
    * shuffles on the block key only; exact within blocks, so it is
    * DuckDB-oracle-checkable. For unblocked corpora use
    * `nearDupLsh` (hyperplane buckets as blocks; recall < 1). */
  def nearDupBlocked(emb: DataFrame, blockCol: String, thresholdE6: Long): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val l = emb.select(col(blockCol).as("block"), col("id").as("id_a"),
      col("vec").cast("array<double>").as("va"))
    val r = emb.select(col(blockCol).as("block"), col("id").as("id_b"),
      col("vec").cast("array<double>").as("vb"))
    // pair scoring as a typed flatMap: primitive double[] access (a UDF
    // over Seq[Double] pays per-element boxing — measured ~10x here)
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("va"), col("vb"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .mapPartitions(_.flatMap { case (ia, ib, a, b) =>
        var dot = 0.0
        var na = 0.0
        var nb = 0.0
        val n = math.min(a.length, b.length)
        var i = 0
        while (i < n) { dot += a(i) * b(i); i += 1 }
        i = 0
        while (i < a.length) { na += a(i) * a(i); i += 1 }
        i = 0
        while (i < b.length) { nb += b(i) * b(i); i += 1 }
        val cos = math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0).toLong
        if (cos >= thresholdE6) Some((ia, ib, cos)) else None
      })
      .toDF("id_a", "id_b", "cos_e6")
  }

  /** Scale path: near-dup pairs via hyperplane-bucket blocking (multiple
    * tables for recall), threshold-filtered — no all-pairs product. */
  def nearDupLsh(emb: DataFrame, thresholdE6: Long,
                 planesPerTable: Int = 6, tables: Int = 8): DataFrame =
    lshTopK(emb, emb, k = Int.MaxValue, planesPerTable, tables)
      .filter(col("cos_e6") >= thresholdE6)
      .filter(col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("cos_e6"))

  private def planeSetsFor(planesPerTable: Int, tables: Int,
                           dim: Int = 64): Array[Array[Array[Double]]] =
    Array.tabulate(tables) { t =>
      Array.tabulate(planesPerTable)(p => hyperplane(t * 131 + p, dim))
    }

  /** Shared sign-pattern kernel: the SAME left-to-right projection math
    * feeds the distributed key pass ([[lshKeys]]) and the driver-side
    * query index ([[lshTopKBroadcast]]), so the two paths bucket
    * identically by construction. Computed over the RAW vector (signs
    * are scale-invariant, but FP-exactness demands one convention). */
  private def bucketOf(v: Array[Double],
                       planes: Array[Array[Double]]): String = {
    val sb = new java.lang.StringBuilder(planes.length)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var proj = 0.0
      var d = 0
      while (d < v.length && d < pl.length) { proj += v(d) * pl(d); d += 1 }
      sb.append(if (proj >= 0) '1' else '0')
      p += 1
    }
    sb.toString
  }

  /** Compact LSH key table: one (id, table, bucket) row per hash table —
    * NO vector payload rides the explode or the candidate shuffle (the
    * 100 TB layout: exchanged rows are ~20 bytes instead of 8×64
    * doubles). One typed pass computes all table keys (compiled Scala —
    * one scan instead of `tables` unions of interpreted projections). */
  private def lshKeys(df: DataFrame, idAs: String,
                      planeSets: Array[Array[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nTables = planeSets.length
    graft.sources.Tables.widen(df)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        (0 until nTables).iterator.map(t => (id, t, bucketOf(v, planeSets(t))))
      })
      .toDF(idAs, "table", "bucket")
  }

  /** L2-normalized vector table (id, vn) — the "vector store" side the
    * candidate pairs re-join to fetch payloads. */
  private def normalized(df: DataFrame, idAs: String,
                         vecAs: String): DataFrame = {
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

  /** Candidate pair generation on COMPACT keys only: equi-join on
    * (table, bucket), dedup across tables — every exchanged row is
    * (id, table, bucket) / (query_id, neighbor_id); vectors never enter
    * this subplan (PlanSpec asserts). */
  def lshCandidates(queries: DataFrame, corpus: DataFrame,
                    planesPerTable: Int = 6, tables: Int = 8): DataFrame = {
    val planeSets = planeSetsFor(planesPerTable, tables)
    val qk = lshKeys(queries, "query_id", planeSets)
    val ck = lshKeys(corpus, "neighbor_id", planeSets)
    qk.join(ck, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
  }

  /** LSH-bucketed ANN: multiple independent hash tables; candidates =
    * compact equi-join on (table, bucket); exact cosine re-rank within
    * candidates. Recall grows with `tables`; cost stays bucket-local.
    *
    * Vectors are fetched AFTER candidate dedup via two co-partitioned
    * id-joins against the normalized vector table (sign patterns are
    * scale-invariant, so raw and normalized bucket keys agree); the
    * cosine over pre-normalized vectors is a compiled UDF dot product. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planesPerTable: Int = 6, tables: Int = 8): DataFrame = {
    val cand = lshCandidates(queries, corpus, planesPerTable, tables)
    val qv = normalized(queries, "query_id", "qv")
    val cv = normalized(corpus, "neighbor_id", "cv")
    // native codegen'd dot (graft.expressions.DotE6) — same left-to-right
    // summation as the boxed-Seq UDF it replaced, inside whole-stage codegen
    val scored = cand
      .join(qv, Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expressions.DotE6.col(col("qv"), col("cv")).as("cos_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Small-query fast path — the ANN *serving* shape at 100 TB: the
    * query set (ids, pre-normalized vectors, per-table bucket keys) is
    * collected and broadcast as a hash index, and the corpus is scanned
    * EXACTLY ONCE — bucketing, normalization, candidate lookup,
    * cross-table dedup and exact scoring all happen map-side with zero
    * corpus shuffle. The only exchange in the plan is the final
    * per-query top-k, which WindowGroupLimit prunes to ≤ k rows per
    * query per partition before anything moves (PlanSpec asserts the
    * single-exchange shape).
    *
    * Results are identical to [[lshTopK]]: same raw-vector bucket math
    * ([[bucketOf]] is the shared kernel), same normalize-then-dot
    * left-to-right summation, same ×1e6 floor, same tie-break
    * (SimilaritySpec pins exact row parity).
    *
    * NOTE eager: collects the query side at composition time (one small
    * job), like [[Ivf.trainCentroids]]. Use [[lshTopK]]'s compact
    * symmetric joins when the query set is itself corpus-sized
    * (e.g. [[nearDupLsh]]). */
  def lshTopKBroadcast(queries: DataFrame, corpus: DataFrame, k: Int,
                       planesPerTable: Int = 6, tables: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val planeSets = planeSetsFor(planesPerTable, tables)
    val qRows = queries
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])].collect()
    // (table ':' bucket) -> [(query_id, normalized query vector)]
    val index = new java.util.HashMap[String, Array[(Long, Array[Double])]]()
    qRows.foreach { case (qid, v) =>
      var ss = 0.0
      var i = 0
      while (i < v.length) { ss += v(i) * v(i); i += 1 }
      val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
      val qn = v.map(_ * inv)
      var t = 0
      while (t < planeSets.length) {
        val key = t + ":" + bucketOf(v, planeSets(t))
        index.put(key, Option(index.get(key)).getOrElse(Array.empty) :+ ((qid, qn)))
        t += 1
      }
    }
    val bc = spark.sparkContext.broadcast(index)
    val scored = graft.sources.Tables.widen(corpus)
      .select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val idx = bc.value
        val nTables = planeSets.length
        rows.flatMap { case (cid, cv) =>
          var ss = 0.0
          var i = 0
          while (i < cv.length) { ss += cv(i) * cv(i); i += 1 }
          val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
          val cvn = cv.map(_ * inv)
          val seen = new java.util.HashSet[Long]()
          val out = List.newBuilder[(Long, Long, Long)]
          var t = 0
          while (t < nTables) {
            val hits = idx.get(t + ":" + bucketOf(cv, planeSets(t)))
            if (hits != null) hits.foreach { case (qid, qn) =>
              if (qid != cid && seen.add(qid)) {
                var dot = 0.0
                var d = 0
                val n = math.min(qn.length, cvn.length)
                while (d < n) { dot += qn(d) * cvn(d); d += 1 }
                out += ((qid, cid, math.floor(dot * 1000000.0).toLong))
              }
            }
            t += 1
          }
          out.result()
        }
      }
      .toDF("query_id", "neighbor_id", "cos_e6")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
