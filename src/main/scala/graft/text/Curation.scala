package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling, token-budget sequence packing, train/test contamination
  * measurement, and n-gram vocabulary mining.
  *
  * Scale design (100 TB):
  *   - hash sampling is MAP-ONLY (a filter on a hash prefix — no shuffle,
  *     no RNG state, reproducible across engines and re-runs; the
  *     industry-standard way to cut a stable slice of a petabyte corpus).
  *   - stratified sampling windows WITHIN strata (partitioned window —
  *     never a global sort), so it scales with the largest stratum.
  *   - sequence packing windows within shards: the cumulative token sum
  *     is per-shard, so bin assignment parallelizes across shards and no
  *     single task sees more than one shard's documents.
  *   - contamination joins on shingle hash (shuffle keyed by shingle —
  *     the join is |test shingles| x matching train shingles, never
  *     doc x doc), with the train side deduplicated before the join.
  *   - n-gram mining is explode -> partial-agg -> shuffle on gram ->
  *     top-k via TakeOrderedAndProject (no global sort materialization).
  */
object Curation {

  /** Deterministic hash sample: keep rows whose md5(id) hex prefix is
    * lexicographically below `hexCeil` — e.g. "20" keeps ~32/256 = 12.5%.
    * Map-only (no shuffle, no sampling state), portable to any engine
    * with md5. The selection column is returned for auditability. */
  def hashSample(df: DataFrame, idCol: String, hexCeil: String): DataFrame =
    df.withColumn("__h2", substring(md5(col(idCol).cast("string").cast("binary")), 1, 2))
      .filter(col("__h2") < hexCeil)
      .drop("__h2")

  /** Deterministic WEIGHTED Bernoulli sample: keep a row with
    * probability `prob` (a per-row Column in [0,1] — e.g. a quality or
    * length weight), decided by comparing the first 8 hex digits of
    * md5(id) against the hex rendering of floor(prob·16^8). Map-only
    * like [[hashSample]] (no RNG state, no shuffle; the decision is a
    * pure function of the id, so re-runs, retries, and other engines
    * agree — the q64 oracle replicates it in SQL). The importance-
    * sampling step of a quality-weighted corpus cut at 100 TB: one
    * filter, zero exchanges. prob ≥ 1 keeps unconditionally (the
    * threshold hex would be 9 digits and lpad-truncate to "00000000" —
    * compared explicitly instead); prob ≤ 0 drops. */
  def weightedSample(df: DataFrame, idCol: String, prob: Column): DataFrame = {
    val u8 = substring(md5(col(idCol).cast("string").cast("binary")), 1, 8)
    val thresh = lpad(lower(hex(floor(prob * lit(4294967296.0)).cast("long"))),
      8, "0")
    df.filter(prob >= lit(1.0) || u8 < thresh)
  }

  /** Benchmark decontamination via a BROADCAST Bloom filter — the shape
    * that works when the corpus is 100 TB and the eval suite is
    * megabytes: build a Bloom sketch of every distinct k-word-shingle
    * hash of the eval set (a distributed tree-aggregate; only the
    * fixed-size bitset reaches the driver), broadcast it, and scan the
    * corpus ONCE, map-only — no shuffle, no join, no corpus-side index.
    * A corpus doc is kept iff fewer than `maxHits` of its distinct
    * shingles might-contain (Bloom guarantees NO false negatives, so a
    * kept doc truly has < maxHits overlapping shingles up to the fp
    * rate; fpp only ever flags extra).
    *
    * NOTE: sketch construction launches two eager jobs over the EVAL
    * side at call time (distinct-count + bloom aggregate) — inherent to
    * model-building operators; the corpus side stays lazy.
    * Output: (id, n_shingles, n_flagged, keep) per corpus doc. */
  /** (id, distinct k-shingle hashes) per document — the shared shape
    * of the decontamination operators. */
  private def docShingleSets(df: DataFrame, textCol: String, idCol: String,
                             k: Int, portable: Boolean) = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.sources.Tables.widen(
        df.select(col(idCol).cast("long"),
          TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, norm) =>
        (id, Dedup.shingleHashes(Dedup.wordHashes(norm, portable), k).distinct)
      })
  }

  def bloomDecontaminate(corpus: DataFrame, eval: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         k: Int = 3, maxHits: Long = 1, fpp: Double = 0.001,
                         portable: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val evalHashes = docShingleSets(eval, textCol, idCol, k, portable)
      .flatMap(_._2).toDF("sh").distinct()
    val nItems = math.max(1L, evalHashes.count())
    val bloom = evalHashes.stat.bloomFilter("sh", nItems, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    docShingleSets(corpus, textCol, idCol, k, portable)
      .mapPartitions { it =>
        val bf = bloomBc.value
        it.map { case (id, shs) =>
          val flagged = shs.count(bf.mightContainLong)
          (id, shs.length.toLong, flagged.toLong, flagged < maxHits)
        }
      }
      .toDF(idCol, "n_shingles", "n_flagged", "keep")
  }

  /** PORTABLE-Bloom decontamination — the hash-checked companion to
    * [[bloomDecontaminate]]: Spark's built-in Bloom filter hashes with
    * engine-specific functions, so q65 is spec-gated only. This variant
    * sets bit positions with the portable polynomial reseed hashes
    * (Hashing.reseed — the same (h·(2j+1)+j·12345+678) mod P formula
    * every oracle replays) over a power-of-two `mBits` bitset, making
    * the whole filter — INCLUDING its false positives — bit-identical
    * in any engine, so the driver hash-compares the full keep/flag
    * output (q118). Same scale shape: the bitset is built by a
    * distributed OR tree-aggregate (only mBits/8 bytes ever reach the
    * driver), broadcast once, and the corpus is scanned map-only. */
  def portableBloomDecontaminate(corpus: DataFrame, eval: DataFrame,
                                 textCol: String = "text",
                                 idCol: String = "doc_id",
                                 k: Int = 3, maxHits: Long = 1,
                                 mBits: Int = 1 << 20,
                                 numHashes: Int = 4): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64")
    require(numHashes >= 1, "numHashes must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val nh = numHashes
    val m = mBits
    def positions(sh: Long): Iterator[Int] =
      (0 until nh).iterator.map(j =>
        (graft.functions.Hashing.reseed(sh, j) % m).toInt)
    val bitWords = docShingleSets(eval, textCol, idCol, k, portable = true)
      .flatMap(_._2).distinct()
      .rdd
      .treeAggregate(new Array[Long](m / 64))(
        (acc, sh) => {
          positions(sh).foreach(p => acc(p >> 6) |= (1L << (p & 63)))
          acc
        },
        (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
    val bc = spark.sparkContext.broadcast(bitWords)
    docShingleSets(corpus, textCol, idCol, k, portable = true)
      .mapPartitions { it =>
        val bits = bc.value
        it.map { case (id, shs) =>
          val flagged = shs.count { sh =>
            positions(sh).forall(p => (bits(p >> 6) & (1L << (p & 63))) != 0L)
          }
          (id, shs.length.toLong, flagged.toLong, flagged < maxHits)
        }
      }
      .toDF(idCol, "n_shingles", "n_flagged", "keep")
  }

  /** Unigram-LM quality scoring — the CCNet/Wikipedia-LM filtering
    * shape: train a token-frequency model on a reference corpus, then
    * score every candidate document by how much of its mass the model
    * recognizes. The model is the top-`vocabSize` tokens by count with
    * an integer-quantized probability p_e9 = floor(count·1e9 / total)
    * (total = ALL train tokens, so probabilities are comparable across
    * vocab cuts); a doc's score is (n_tokens, n_oov, Σ p_e9 of in-vocab
    * tokens) — higher mean p and lower OOV ratio = more natural text.
    * Integer arithmetic end-to-end (one double multiply+divide per vocab
    * entry, replicated operation-for-operation in the q68 oracle), so
    * results are bit-stable across engines and partitionings.
    *
    * Scale shape: training is one explode → partial-agg count → top-V
    * via TakeOrdered (only `vocabSize` rows ever reach the driver); the
    * model broadcasts as a plain HashMap and the corpus is scored in ONE
    * map-only compiled pass — no join, no corpus shuffle. The 100 TB
    * decontamination-style plan: model to driver (bounded), model to
    * executors (broadcast), data touched once.
    *
    * NOTE: like [[bloomDecontaminate]], model construction launches two
    * eager jobs over the TRAIN side at call time (token total + top-V);
    * the corpus side stays lazy.
    * Output: (id, n_tokens, n_oov, sum_p_e9). */
  def lmScore(corpus: DataFrame, train: DataFrame,
              textCol: String = "text", idCol: String = "doc_id",
              vocabSize: Int = 1000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val counts = train
      .select(explode(TextAnalysis.wordsCol(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c")).as[Long].head()
    val vocab = counts.orderBy(col("c").desc, col("tok").asc)
      .limit(vocabSize).as[(String, Long)].collect()
      .map { case (tok, c) =>
        tok -> math.floor(c.toDouble * 1e9 / total.toDouble).toLong
      }.toMap
    val vocabBc = spark.sparkContext.broadcast(vocab)
    graft.sources.Tables.widen(
        corpus.select(col(idCol).cast("long"),
          TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = vocabBc.value
        it.map { case (id, norm) =>
          val ws = norm.split(" ", -1)
          var oov = 0L; var sumP = 0L; var i = 0
          while (i < ws.length) {
            v.get(ws(i)) match {
              case Some(p) => sumP += p
              case None => oov += 1
            }
            i += 1
          }
          (id, ws.length.toLong, oov, sumP)
        }
      }
      .toDF(idCol, "n_tokens", "n_oov", "sum_p_e9")
  }

  /** Bigram-LM scoring — the n-gram-LM quality filter (CCNet trains a
    * 5-gram KenLM; the distributed shape is identical at any order):
    * train bigram TRANSITION probabilities on a reference corpus, then
    * score each candidate doc by how predictable its word transitions
    * are. p_e9(w1→w2) = floor(c(w1,w2)·1e9 / c(w1→*)) over the
    * top-`vocabSize` bigrams by count (ties broken lexicographically);
    * a doc scores (n_bigrams, n_oov_bigrams, Σ p_e9 of in-model
    * bigrams). Integer-quantized like [[lmScore]], so the q95 oracle
    * replicates it bit-for-bit.
    *
    * Scale shape — same as [[lmScore]] plus one distributed join:
    * bigram counts and their per-context totals aggregate in parallel;
    * only after the top-V cut (TakeOrdered) do V rows reach the driver,
    * JOINED to their context totals while still distributed, so driver
    * state is O(V) even though the context vocabulary is unbounded. The
    * corpus is scored in ONE broadcast map-only pass — no corpus
    * shuffle. Output: (id, n_bigrams, n_oov_bigrams, sum_p_e9). */
  def lmScoreBigram(corpus: DataFrame, train: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    vocabSize: Int = 1000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bg = train
      .select(TextAnalysis.wordsCol(col(textCol)).as("ws"))
      .select(explode(TextAnalysis.bigramsOf("ws")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val ctx = bc.groupBy("w1").agg(sum("c").as("cc"))
    val model = bc
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc)
      .limit(vocabSize)
      .join(ctx, "w1")
      .select(col("w1"), col("w2"), col("c"), col("cc"))
      .as[(String, String, Long, Long)].collect()
      .map { case (w1, w2, c, cc) =>
        (w1 + " " + w2) ->
          math.floor(c.toDouble * 1e9 / cc.toDouble).toLong
      }.toMap
    val modelBc = spark.sparkContext.broadcast(model)
    graft.sources.Tables.widen(
        corpus.select(col(idCol).cast("long"),
          TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = modelBc.value
        it.map { case (id, norm) =>
          val ws = norm.split(" ", -1)
          var oov = 0L; var sumP = 0L; var i = 0
          while (i < ws.length - 1) {
            m.get(ws(i) + " " + ws(i + 1)) match {
              case Some(p) => sumP += p
              case None => oov += 1
            }
            i += 1
          }
          (id, math.max(ws.length - 1, 0).toLong, oov, sumP)
        }
      }
      .toDF(idCol, "n_bigrams", "n_oov_bigrams", "sum_p_e9")
  }

  /** CCNet-style perplexity bucketing on top of [[lmScoreBigram]]: rank
    * each candidate document by its mean in-model transition probability
    * (the integer-exact stand-in for negative log-perplexity — higher
    * mean p means the reference LM finds the text more predictable),
    * then cut the corpus into head / middle / tail at fixed thresholds.
    * CCNet keeps head+middle and drops the tail (gibberish, boilerplate
    * soup); `keep` encodes that decision.
    *
    * mean_p_e9 = sum_p_e9 div max(n_bigrams - n_oov_bigrams, 1) — the
    * mean over IN-MODEL bigrams only, so out-of-vocabulary mass (rare
    * words) does not masquerade as unpredictability; oov_e4 reports it
    * separately, and fully-OOV docs land in the tail by construction.
    *
    * Scale shape: identical to [[lmScoreBigram]] (model to driver at
    * O(V), corpus scored in one broadcast map-only pass) plus a
    * map-only CASE — no additional shuffle, no global quantile job
    * (fixed thresholds are the production choice: they are stable
    * across shards and re-runs, a percentile cut would need a global
    * sort or an approximate sketch). */
  def perplexityBucket(corpus: DataFrame, train: DataFrame,
                       textCol: String = "text", idCol: String = "doc_id",
                       vocabSize: Int = 1000,
                       headE9: Long = 37000000L,
                       midE9: Long = 30000000L): DataFrame =
    lmScoreBigram(corpus, train, textCol, idCol, vocabSize)
      .withColumn("mean_p_e9",
        expr("sum_p_e9 div greatest(n_bigrams - n_oov_bigrams, 1L)"))
      .withColumn("oov_e4",
        expr("n_oov_bigrams * 10000L div greatest(n_bigrams, 1L)"))
      .withColumn("bucket",
        when(col("mean_p_e9") >= headE9, "head")
          .when(col("mean_p_e9") >= midE9, "middle")
          .otherwise("tail"))
      .withColumn("keep", col("bucket") =!= "tail")

  /** Deterministic training-shuffle shard assignment: the global
    * "shuffle the corpus, cut it into fixed shards" step every training
    * run needs, without a global sort. shard = polyhash(id) mod
    * `nShards` (map-only); pos = row_number within the shard ordered by
    * (hash, id) — a window PARTITIONED by shard, so the plan is one
    * hash shuffle on the shard key and every shard ranks in parallel.
    * The hash order IS the shuffle: adjacent input docs land in
    * unrelated (shard, pos) slots, deterministically — re-runs and
    * engines agree (the q55 oracle replicates it), and a writer can
    * `repartition($"shard").sortWithinPartitions($"pos")` to stream
    * shard files straight out with no further exchange. */
  def shardAssignments(df: DataFrame, idCol: String = "doc_id",
                       nShards: Int = 64): DataFrame = {
    val h = graft.functions.Hashing.polyHashCol(col(idCol).cast("string"))
    val withShard = df.select(col(idCol))
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("h").asc, col(idCol).asc)
    withShard.withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Materialize the training shuffle as shard FILES, in ONE shuffle
    * total: the ranking window's hash exchange on `shard` already
    * leaves the data co-located by shard and sorted by (shard, hash,
    * id) = (shard, pos) within partitions, so the `partitionBy(shard)`
    * writer streams every shard straight out in its final order — the
    * trailing sortWithinPartitions is satisfied by the window's output
    * ordering and elides. One `shard=N/` directory per shard, rows
    * inside each file in pos order. Format is any Spark sink
    * ("parquet", "json" for JSONL training shards). */
  def writeShards(docs: DataFrame, outDir: String, nShards: Int = 64,
                  idCol: String = "doc_id",
                  format: String = "parquet"): Unit = {
    val h = graft.functions.Hashing.polyHashCol(col(idCol).cast("string"))
    val withShard = docs.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("__h").asc, col(idCol).asc)
    withShard.withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").format(format)
      .partitionBy("shard").save(outDir)
  }

  /** Sliding-window document chunking — the context-window prep step:
    * each doc's (normalized, whitespace-split) words are cut into
    * chunks of `chunkTokens` words advancing by `chunkTokens - overlap`
    * (so consecutive chunks share `overlap` words); the tail chunk may
    * be shorter. One compiled MAP-ONLY pass (the fan-out multiplies
    * rows ~n/step×, so the source is widened first); chunk ids are
    * per-doc ordinals — deterministic, no shuffle, no state.
    * Output: (id, chunk_idx, chunk_text, n_chunk_tokens). */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int, overlap: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val step = chunkTokens - overlap
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Tables.widen(
        docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val words = TextAnalysis.normalize(text).split(" ", -1)
        val n = words.length
        (0 until n by step).iterator.zipWithIndex.map { case (s, idx) =>
          val end = math.min(s + chunkTokens, n)
          (id, idx.toLong, words.slice(s, end).mkString(" "),
            (end - s).toLong)
        }
      })
      .toDF(idCol, "chunk_idx", "chunk_text", "n_chunk_tokens")
  }

  /** Domain-mixture sampling by TOKEN budget (the "N tokens per domain"
    * step of a training-mixture recipe): within each domain, documents
    * are taken in deterministic hash order until the domain's token
    * budget is exhausted — a doc is kept iff the tokens BEFORE it fit
    * the budget (watermark semantics, like [[packSequences]]: the doc
    * that straddles the boundary is kept, so every non-empty budget
    * takes at least one doc).
    *
    * Scale shape: budgets are a tiny broadcast dim; the running token
    * sum is a window PARTITIONED by domain (parallel across domains,
    * never a global sort); everything else is map-side. Deterministic
    * across engines and re-runs — no RNG state, the hash order IS the
    * shuffle. Output: (id, domain, n_tokens, cum_before) of kept docs. */
  def tokenBudgetMixture(docs: DataFrame, budgets: Map[String, Long],
                         domainCol: String = "source",
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val budgetDf = broadcast(
      budgets.toSeq.toDF(domainCol, "__budget"))
    val h = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(domainCol)).orderBy(h.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(domainCol),
        TextAnalysis.tokenCountCol(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(budgetDf, domainCol)
      .filter(col("cum_before") < col("__budget"))
      .select(col(idCol), col(domainCol), col("n_tokens"), col("cum_before"))
  }

  /** Deterministic stratified sample: the `n` rows of each stratum with
    * the smallest md5(id) — an order-free "random n per group" whose
    * window is PARTITIONED by stratum (no global sort; ties on the
    * 32-hex-digit hash are broken by id, so the pick is total). */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       n: Int): DataFrame = {
    val h = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Token-budget sequence packing: within each shard (ordered by id),
    * documents are laid head-to-tail and cut into bins of `budget`
    * tokens — bin = floor(exclusive-prefix-tokens / budget), offset =
    * position within the bin. A document whose tokens straddle a
    * boundary stays in the bin where it starts (the standard
    * pack-with-overflow shape; budget is a watermark, not a hard wall).
    * The window is partitioned by shard: packing parallelizes across
    * shards and never globally sorts the corpus. */
  def packSequences(docs: DataFrame, budget: Long,
                    shardCol: String = "source", idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val tokens = TextAnalysis.tokenCountCol(col(textCol)).cast("long")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), col(shardCol), tokens.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__cum") - col("n_tokens"))
      .select(col(idCol), col(shardCol), col("n_tokens"),
        // integer `div`, not `/`: double division drifts from the exact
        // `%`-based offset once per-shard cumulative tokens approach
        // 2^52/budget, de-syncing bin and offset for non-power-of-two
        // budgets (the oracle divides exactly)
        expr(s"__start div $budget").as("bin"),
        (col("__start") % budget).as("offset"))
  }

  /** Train/test contamination: for each test document, how many of its
    * distinct k-word shingles appear anywhere in the train split.
    * The train side is reduced to DISTINCT shingle hashes before the
    * join (the shuffled "contamination index"; at 100 TB this is the
    * side you'd snapshot and reuse across evaluation rounds), and the
    * join key is the shingle hash — cost is bounded by shingle-hash
    * collisions, never by document pairs. Test documents with zero
    * contaminated shingles are preserved via the left join.
    * Output: (idCol, n_shingles, n_hit, contam_e4). */
  def contamination(train: DataFrame, test: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    k: Int = 3, portable: Boolean = true): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    def shingles(df: DataFrame, idAs: String): DataFrame =
      graft.sources.Tables.widen(
          df.select(col(idCol).cast("long").as(idAs),
            TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, norm) =>
          (id, Dedup.shingleHashes(Dedup.wordHashes(norm, portable), k).distinct)
        })
        .toDF(idAs, "__shs")
        .select(col(idAs), explode(col("__shs")).as("sh"))
    val trainIndex = shingles(train, "__tid").select("sh").distinct()
      .withColumn("__hit", lit(1L))
    val testSh = shingles(test, idCol)
    testSh.join(trainIndex, Seq("sh"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum("__hit"), lit(0L)).as("n_hit"))
      .withColumn("contam_e4",
        floor(col("n_hit").cast("double") * 10000.0
          / col("n_shingles").cast("double")).cast("long"))
  }

  /** Top-k most frequent word n-grams across the corpus (vocabulary /
    * boilerplate mining). Gram extraction is a compiled typed pass;
    * counting is partial-agg -> one shuffle on the gram; the final top-k
    * is sort-limited (TakeOrderedAndProject — only k rows cross to the
    * driver side of the plan). Ties rank lexicographically. */
  def topNgrams(docs: DataFrame, n: Int, k: Int,
                textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.sources.Tables.widen(
        docs.select(TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
      .as[String]
      .mapPartitions(_.flatMap { norm =>
        val words = norm.split(" ", -1)
        if (words.length < n) Iterator.empty
        else (0 to words.length - n).iterator
          .map(i => words.slice(i, i + n).mkString(" "))
      })
      .toDF("gram")
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }

  /** Leakage-safe train/val/test split: the split is decided by the
    * near-dup CLUSTER id (the `component` column of
    * Components.dedupClusters), not the document id, so near-duplicate
    * documents can never straddle a split boundary — the eval-set
    * leakage every dedup pipeline exists to prevent. The decision is
    * the md5-hex-prefix compare of [[hashSample]] on the component:
    * map-only over the cluster table, reproducible, engine-portable.
    * Default ceilings "cc"/"e6" ≈ 80/10/10. */
  def leakageSafeSplit(clusters: DataFrame,
                       componentCol: String = "component",
                       trainCeil: String = "cc",
                       valCeil: String = "e6"): DataFrame =
    clusters.withColumn("__h2",
        substring(md5(col(componentCol).cast("string").cast("binary")), 1, 2))
      .withColumn("split",
        when(col("__h2") < trainCeil, "train")
          .when(col("__h2") < valCeil, "val")
          .otherwise("test"))
      .drop("__h2")

  /** Per-group cap ("domain cap", the C4/RefinedWeb curation step that
    * stops a handful of mega-domains from dominating a crawl corpus):
    * keep at most `cap` rows per value of `groupCol`, selected by the
    * total order `order` (make it total — include a unique id as the
    * last key — or ties fall to range-partition placement).
    *
    * Scale shape: NOT `Window.partitionBy(group)` — a partitioned
    * window funnels ALL rows of a group through one task, and domain
    * skew is exactly the problem this operator exists to fix. Instead
    * the two-pass range-shuffle shape of Relational.sequentialIds,
    * generalized per-group: range-repartition on (group, order…) so a
    * mega-group spreads across MANY contiguous partitions; sort within
    * partitions; pass 1 collects ONLY each partition's boundary summary
    * (first/last run group + count, run count) — after the range
    * shuffle a group's rows are globally contiguous, so a group that
    * spans partitions is necessarily every later partition's FIRST run,
    * and interior runs always start at rank 0. Driver state is
    * O(partitions) (a 10^8-domain corpus costs the driver the same few
    * KB as a 10^2-domain one); pass 2 ranks locally, offsetting only
    * the partition's first run by the broadcast carry, and filters
    * rank <= cap. No task ever holds more than one partition. */
  def capPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
                  cap: Int, rankCol: String = "rank_in_group"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val keyed = df.withColumn("__cap_grp", col(groupCol).cast("string"))
    val sortCols = col("__cap_grp") +: order
    val sorted = keyed.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val gIdx = sorted.schema.fieldIndex("__cap_grp")
    val rdd = sorted.rdd
    // pass 1: boundary summary per partition —
    // (firstGroup, firstRunCount, lastGroup, lastRunCount, nRuns)
    val bounds: Array[(Int, Option[(String, Long, String, Long, Long)])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var runs = 0L
        var firstG: String = null
        var firstN = 0L
        var curG: String = null
        var curN = 0L
        it.foreach { row =>
          val g = row.getString(gIdx)
          if (runs == 0L) { runs = 1L; firstG = g; curG = g }
          else if (g != curG) {
            if (runs == 1L) firstN = curN
            runs += 1L
            curG = g
            curN = 0L
          }
          curN += 1L
        }
        if (runs == 1L) firstN = curN
        val res =
          if (runs == 0L) None else Some((firstG, firstN, curG, curN, runs))
        Iterator.single((pid, res))
      }.collect().sortBy(_._1)
    // carry = rows of the currently-open group in all earlier partitions;
    // it offsets the next partition's first run iff the group continues
    val offsets = new Array[Long](bounds.length)
    var carryG: String = null
    var carryN = 0L
    var hasCarry = false
    bounds.foreach {
      case (pid, None) => offsets(pid) = 0L // empty partition: carry rides
      case (pid, Some((fg, fn, lg, ln, nRuns))) =>
        val off = if (hasCarry && fg == carryG) carryN else 0L
        offsets(pid) = off
        if (nRuns == 1L) { carryG = fg; carryN = off + fn }
        else { carryG = lg; carryN = ln }
        hasCarry = true
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val firstOff = bc.value(pid)
      var cur: String = null; var local = 0L; var base = 0L; var any = false
      it.flatMap { row =>
        val g = row.getString(gIdx)
        if (!any) { any = true; cur = g; base = firstOff }
        else if (g != cur) { cur = g; base = 0L; local = 0L }
        local += 1
        val rank = base + local
        if (rank <= cap) Some(Row.fromSeq(row.toSeq :+ rank)) else None
      }
    }
    spark.createDataFrame(out, schema).drop("__cap_grp")
  }
}
