package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.expressions.XXH64
import graft.functions.Hashing
import graft.ops.Relational

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy keep-first), MinHash+LSH banding, SimHash, and n-gram
  * Jaccard — all shuffle-bucketed, never all-pairs.
  *
  * Scale design (100 TB):
  *   - exact dedup shuffles once on the content hash; keep-first is a
  *     row_number window inside each hash bucket (no global sort).
  *   - MinHash-LSH: docs → signatures (map-only) → explode to (band,
  *     bandKey) — candidate pairs come from a self-equi-join on the band
  *     key, so the shuffle is on band buckets; no crossJoin anywhere. Skewed
  *     mega-buckets (boilerplate docs) can be salted or capped upstream.
  *   - signature computation is partition-local compiled Scala via a typed
  *     map (not nested higher-order Column functions: Spark evaluates HOF
  *     lambdas interpreted, and nesting them re-evaluates the inner array
  *     per outer element — quadratic per doc and orders of magnitude
  *     slower than JIT'd code; measured as the bottleneck of the whole
  *     suite). Normalization stays in codegen'd expressions.
  *   - hashes: pluggable. `portable = true` uses the polynomial hash
  *     (cross-engine reproducible — what the DuckDB oracle checks);
  *     `false` uses xxhash64 with Spark's seed (bit-identical to the
  *     `xxhash64` SQL function), the production path.
  */
object Dedup {

  /** Small inputs arrive as one parquet partition (a 2 MB file), which
    * would serialize every typed map below onto one core — shared widen
    * helper (see its scale note). */
  private def widen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.sources.Tables.widen(df)

  /** Exact dedup: canonical row per normalized-text hash, keeping the
    * lowest `idCol`. Returns the surviving rows. */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val hashed = docs.withColumn("__h", md5(TextAnalysis.normalizeCol(col(textCol))))
    Relational.keepFirst(hashed, Seq(col("__h")), Seq(col(idCol))).drop("__h")
  }

  // ---- partition-local signature math (compiled, oracle-replicable) ----

  /** xxhash64 of a string with Spark's default seed 42 — bit-identical to
    * the `xxhash64` SQL function on a string column. */
  def xxhash64String(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Word hashes of a pre-normalized text (split on single spaces —
    * identical to Spark/DuckDB string_split semantics incl. the
    * empty-string → [""] case). */
  def wordHashes(norm: String, portable: Boolean): Array[Long] = {
    val words = norm.split(" ", -1)
    if (portable) words.map(Hashing.polyHash) else words.map(xxhash64String)
  }

  /** k-word shingle hashes from word hashes: fold (acc*31+h) mod P over
    * each window. Replicates the oracle's list_reduce over whs[i:i+k-1];
    * when n < k the single partial window is hashed as-is. */
  def shingleHashes(wh: Array[Long], k: Int): Array[Long] = {
    val n = math.max(wh.length - k + 1, 1)
    Array.tabulate(n) { i =>
      var acc = 0L
      var j = i
      val end = math.min(i + k, wh.length)
      while (j < end) { acc = Math.floorMod(acc * 31 + wh(j), Hashing.P); j += 1 }
      acc
    }
  }

  /** MinHash signature: per reseed j, min over shingles of
    * (h*(2j+1) + j*12345+678) mod P. */
  def minhashSig(sh: Array[Long], numHashes: Int): Array[Long] =
    Array.tabulate(numHashes) { j =>
      var m = Long.MaxValue
      var i = 0
      while (i < sh.length) {
        val v = Hashing.reseed(sh(i), j)
        if (v < m) m = v
        i += 1
      }
      m
    }

  /** SimHash: per bit, ±1 votes across word hashes; bit set iff votes>0. */
  def simhashValue(wh: Array[Long], bits: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var votes = 0L
      var i = 0
      while (i < wh.length) {
        votes += (if (((wh(i) >>> b) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (votes > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** (doc, sig: array<long>) MinHash signatures — one map-only pass;
    * normalization codegen'd, hashing compiled. */
  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", k: Int = 3,
                        numHashes: Int = 16,
                        portable: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long").as("doc"),
        TextAnalysis.normalizeCol(col(textCol)).as("norm")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, norm) =>
        (id, minhashSig(shingleHashes(wordHashes(norm, portable), k), numHashes))
      })
      .toDF("doc", "sig")
  }

  /** LSH banding: explode each signature into (doc, band, band_key) rows;
    * band_key = the band's signature slice joined with '_'. */
  def lshBands(docs: DataFrame, textCol: String, idCol: String,
               k: Int, numHashes: Int, bands: Int,
               portable: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    minhashSignatures(docs, textCol, idCol, k, numHashes, portable)
      .select(col("doc"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("_",
            transform(slice(col("sig"), b * lit(r) + lit(1), lit(r)),
              x => x.cast("string"))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Near-duplicate candidate pairs via banded MinHash: group each
    * (band, band_key) bucket and emit its member combinations (a < b),
    * then distinct across bands. ONE signature pass (a self-join would
    * recompute the uncached signature plan for each side), one shuffle on
    * band buckets, never an all-pairs product across buckets.
    *
    * Skew guard (ON by default): a degenerate bucket — boilerplate text
    * hashing thousands of documents into one (band, band_key) — would
    * emit O(n²) pairs from one task. Buckets larger than `maxBucket`
    * degrade to the STAR shape: every member pairs with the bucket's
    * smallest id (O(n) pairs), so no member silently vanishes and
    * cluster connectivity survives for dedup (connected components /
    * keep-first both still see the whole cluster); only
    * redundant intra-cluster pairs are skipped. Buckets at or under the
    * cap keep exact all-pairs semantics. 0 = uncapped. */
  def minhashCandidatePairs(docs: DataFrame, textCol: String = "text",
                            idCol: String = "doc_id", k: Int = 3,
                            numHashes: Int = 16, bands: Int = 4,
                            portable: Boolean = true,
                            maxBucket: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    lshBands(docs, textCol, idCol, k, numHashes, bands, portable)
      .select(col("band"), col("band_key"), col("doc"))
      .as[(Int, String, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (_, it) =>
        val ds = it.map(_._3).toArray.sorted
        if (maxBucket > 0 && ds.length > maxBucket) {
          val rep = ds.head
          ds.iterator.drop(1).map(d => (rep, d))
        } else {
          for {
            i <- ds.indices.iterator
            j <- (i + 1) until ds.length
          } yield (ds(i), ds(j))
        }
      }
      .toDF("doc_a", "doc_b").distinct()
  }

  /** Near-duplicate candidate pairs with COMPLETE pair semantics at any
    * skew: same banding as [[minhashCandidatePairs]], but a mega-bucket
    * (> `maxBucket` members) is not degraded to a star — its all-pairs
    * work is DISTRIBUTED over (group_i, group_j) triangle tasks instead:
    *
    *   - one shuffle keys every bucket member with its bucket size `n`
    *     and a stable position `p` (ordered by doc id);
    *   - members of oversized buckets replicate to the g = ceil(n/maxBucket)
    *     group-pair tasks their group participates in (the classic
    *     triangle/partitioned self-join scheme — replication factor g per
    *     row, i.e. n/maxBucket);
    *   - each task emits pairs between (or within) two groups of at most
    *     `maxBucket` members — per-task cost is bounded by maxBucket²
    *     regardless of how degenerate the bucket is.
    *
    * Emitted pairs are exactly the uncapped all-pairs set (the q24 oracle
    * verifies this equality through the driver), so use this when
    * downstream scoring needs every candidate pair; use the star cap when
    * keep-first/connected-components connectivity is enough. */
  def minhashCandidatePairsComplete(docs: DataFrame, textCol: String = "text",
                                    idCol: String = "doc_id", k: Int = 3,
                                    numHashes: Int = 16, bands: Int = 4,
                                    portable: Boolean = true,
                                    maxBucket: Int = 1000): DataFrame = {
    require(maxBucket > 0, "maxBucket must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")
    // the sized band table feeds BOTH the small-bucket and mega-bucket
    // branches; without the lazy checkpoint each branch re-runs the
    // signature mapPartitions and the bucket window (verified:
    // ReusedExchange does not fire across the differing filters). The
    // table is narrow — (band, key, doc, n, p), no text
    val sized = lshBands(docs, textCol, idCol, k, numHashes, bands, portable)
      .select(col("band"), col("band_key"), col("doc"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("p", row_number().over(w.orderBy("doc")) - 1)
      .localCheckpoint(eager = false)
      .as[(Int, String, Long, Long, Int)]
    val small = sized.filter(_._4 <= maxBucket)
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (_, it) =>
        val ds = it.map(_._3).toArray.sorted
        for {
          i <- ds.indices.iterator
          j <- (i + 1) until ds.length
        } yield (ds(i), ds(j))
      }
    val big = sized.filter(_._4 > maxBucket)
      .flatMap { case (band, key, doc, n, p) =>
        val g = ((n + maxBucket - 1) / maxBucket).toInt
        val gp = p / maxBucket
        (0 until g).iterator.map { j =>
          (band, key, math.min(gp, j), math.max(gp, j), doc, gp)
        }
      }
      .groupByKey(t => (t._1, t._2, t._3, t._4))
      .flatMapGroups { (key: (Int, String, Int, Int),
                        it: Iterator[(Int, String, Int, Int, Long, Int)]) =>
        val (_, _, gi, gj) = key
        val members = it.map(t => (t._5, t._6)).toArray
        if (gi == gj) {
          val ds = members.map(_._1).sorted
          for {
            i <- ds.indices.iterator
            j <- (i + 1) until ds.length
          } yield (ds(i), ds(j))
        } else {
          // groups are position-ordered by doc id, so every gi member id
          // is below every gj member id — pairs come out (low, high)
          val left = members.collect { case (d, g) if g == gi => d }
          val right = members.collect { case (d, g) if g == gj => d }
          for (a <- left.iterator; b <- right.iterator) yield (a, b)
        }
      }
    small.union(big).toDF("doc_a", "doc_b").distinct()
  }

  /** (doc, simhash) — 64-bit with xxhash64 word hashes in production;
    * `bits = 30` with the portable hash for oracle-checked runs (the
    * polynomial hash is mod 1e9+7, so only the low 30 bits carry signal). */
  def simhash(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id", bits: Int = 64,
              portable: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long").as("doc"),
        TextAnalysis.normalizeCol(col(textCol)).as("norm")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, norm) =>
        (id, simhashValue(wordHashes(norm, portable), bits))
      })
      .toDF("doc", "simhash")
  }

  /** Hamming distance between two simhash values. */
  def hammingCol(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The exploded distinct-shingle table (doc, sh) — shared by the
    * Jaccard and containment joins. Lazily localCheckpoint'ed: three
    * branches consume it (A side, B side, sizes), and without the
    * checkpoint each branch re-runs the scan + signature mapPartitions
    * (the typed map blocks subplan merging). The table is NARROW — two
    * longs per shingle, no text — so one materialization is far cheaper
    * than three corpus passes at any scale. */
  private def shingleTable(docs: DataFrame, textCol: String, idCol: String,
                           k: Int, portable: Boolean): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    widen(docs.select(col(idCol).cast("long").as("doc"),
        TextAnalysis.normalizeCol(col(textCol)).as("norm")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, norm) =>
        (id, shingleHashes(wordHashes(norm, portable), k).distinct)
      })
      .toDF("doc", "shs")
      .select(col("doc"), explode(col("shs")).as("sh"))
      .localCheckpoint(eager = false)
  }

  /** n-gram Jaccard similarity ×1e4 between paired docs: distinct shingle
    * sets compared via explode + inner-join group counts (portable; no
    * array_intersect dialect dependence). `pairs` has (doc_a, doc_b);
    * shingles computed from `docs`. */
  def ngramJaccardScaled(docs: DataFrame, pairs: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         k: Int = 2, portable: Boolean = true): DataFrame = {
    val sh = shingleTable(docs, textCol, idCol, k, portable)
    val sizes = sh.groupBy("doc").agg(count("*").as("n"))
    val shA = sh.select(col("doc").as("doc_a"), col("sh"))
    val shB = sh.select(col("doc").as("doc_b"), col("sh"))
    val nA = sizes.select(col("doc").as("doc_a"), col("n").as("n_a"))
    val nB = sizes.select(col("doc").as("doc_b"), col("n").as("n_b"))
    pairs
      .join(shA, Seq("doc_a"))
      .join(shB, Seq("doc_b", "sh")) // equi-join on shingle hash = set intersect
      .groupBy("doc_a", "doc_b").agg(count("*").as("n_inter"))
      .join(nA, Seq("doc_a")).join(nB, Seq("doc_b"))
      .withColumn("jaccard_e4",
        floor(col("n_inter").cast("double") * 10000.0
          / (col("n_a") + col("n_b") - col("n_inter")).cast("double")).cast("long"))
      .select("doc_a", "doc_b", "jaccard_e4")
  }

  /** DIRECTED n-gram containment for given candidate pairs:
    * cont_a_e6 = |A cap B| * 1e6 div |A| (and symmetrically for B), the
    * asymmetric Jaccard that catches doc-inside-doc duplication —
    * a quote-heavy page or a superset crawl that plain Jaccard misses
    * because the union dwarfs the intersection. Integer-quantized
    * (exact div, no floats), so the q101 oracle hash-matches.
    *
    * Same scale shape as [[ngramJaccardScaled]]: the intersection is an
    * equi-join on shingle hash (shuffle keyed by shingle, never
    * doc x doc), sizes come from a per-doc agg, and the pair table
    * bounds the output. */
  def containmentScaled(docs: DataFrame, pairs: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        k: Int = 3, portable: Boolean = true): DataFrame = {
    val sh = shingleTable(docs, textCol, idCol, k, portable)
    val sizes = sh.groupBy("doc").agg(count("*").as("n"))
    pairs
      .join(sh.select(col("doc").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count("*").as("n_inter"))
      .join(sizes.select(col("doc").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        expr("n_inter * 1000000L div n_a").as("cont_a_e6"),
        expr("n_inter * 1000000L div n_b").as("cont_b_e6"))
  }

  /** C4-style repeated-LINE removal (Raffel et al. 2020 §2.2 shape):
    * split each document on newlines, drop every line whose hash
    * appears in at least `minDocs` DISTINCT documents (boilerplate:
    * navigation bars, cookie banners, subscribe prompts repeat across a
    * site; real content doesn't), and reassemble the survivors in
    * order. Returns (doc_id, n_lines, n_dropped, cleaned_text).
    *
    * Scale shape: explode to (doc, pos, line-hash) -> distinct-doc
    * count per hash (two partial aggs) -> join back on hash -> per-doc
    * rebuild via an ORDERED collect inside one agg (sort_array of
    * (pos, line) structs — no window, no global sort; per-task state is
    * one document's lines). The join is a hash equi-join on the line
    * hash — never doc x doc — and only hashes, never line text, cross
    * the counting shuffle. Deliberately TWO corpus passes (count pass
    * prunes to (doc, hash); rebuild pass carries text) rather than one
    * checkpointed explode: materializing every line of a 100 TB corpus
    * costs more than a second columnar scan — the opposite tradeoff
    * from the narrow shingle/postings tables, which ARE checkpointed. */
  def removeRepeatedLines(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id",
                          minDocs: Long = 3L): DataFrame = {
    val lines = widen(docs.select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), "\n").as("__ls")))
      .select(col("doc_id"),
        posexplode(col("__ls")).as(Seq("pos", "line")))
      .withColumn("lineh", md5(col("line")))
    val repeated = lines
      .groupBy("lineh").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("lineh"), lit(true).as("__rep"))
    lines
      .join(repeated, Seq("lineh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__rep"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(
            sort_array(collect_list(when(col("__rep").isNull,
              struct(col("pos"), col("line"))))),
            s => s.getField("line")), "\n").as("cleaned_text"))
  }
}
