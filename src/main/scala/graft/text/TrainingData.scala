package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-data preparation pipeline — the single call
  * a user runs to turn a raw document corpus into packed, split,
  * decontaminated training data. Composes the individually-verified
  * stages in the order production pipelines run them (C4/RefinedWeb/
  * Dolma shape):
  *
  *   1. quality + language gate          (TextAnalysis.stats, q22)
  *   2. exact dedup, keep-first          (Dedup.exact, q21)
  *   3. near-dup CLUSTERING              (MinHash bands -> Jaccard
  *      confirm -> connected components; representative = min doc id —
  *      q24/q25/q52) and drop of non-representatives
  *   4. eval decontamination             (distinct 3-shingle overlap vs
  *      the eval set; drop docs at/over `maxContamE4` — q47)
  *   5. leakage-safe split               (train/val/test by md5 of the
  *      near-dup COMPONENT id, so surviving docs whose duplicates were
  *      dropped still land deterministically with their cluster — q90)
  *   6. token-budget packing WITHIN each split (q46)
  *
  * Output: (doc_id, component, split, n_tokens, bin, offset) — one row
  * per surviving document, everything downstream needs to write shard
  * files. Integer-exact end to end, so the q108 oracle replays the
  * whole composition in SQL and hash-matches.
  *
  * Scale shape: inherits each stage's (gate map-only; dedup one
  * hash-shuffle; candidates band-bucketed with the skew cap; components
  * O(log n) rounds; contamination keyed by shingle hash; split
  * map-only; packing windowed WITHIN splits). The deduped corpus is the
  * one checkpointed intermediate (multiple consumers — same rule as
  * CleanCorpus).
  */
object TrainingData {

  /** `contamK` = 8 by default: decontamination shingle length follows
    * the 8-13-gram industry practice (GPT-3/PaLM report 8-13) — short
    * shingles saturate on small vocabularies (EVERY doc matches some
    * eval 3-gram once the eval set covers the shingle space) and would
    * silently empty the corpus; 8-grams only match on genuine copying. */
  def prepare(docs: DataFrame, eval: DataFrame,
              minQualityE4: Long = 3000, langs: Seq[String] = Seq("en"),
              jaccardThresholdE4: Long = 6000, maxContamE4: Long = 2000,
              contamK: Int = 8, packBudget: Long = 512L,
              textCol: String = "text", idCol: String = "doc_id",
              portable: Boolean = true, maxBucket: Int = 1000): DataFrame = {
    // 1-2. quality/language gate + exact dedup (shared prelude with
    // CleanCorpus.clean; checkpointed — candidate gen, Jaccard confirm,
    // clustering, and contamination all read the surviving corpus)
    val deduped = CleanCorpus.gatedDeduped(docs, minQualityE4, langs,
      textCol, idCol)
    // 3. near-dup clusters from Jaccard-confirmed candidate pairs;
    // representatives (component == doc_id) survive. The confirm filter
    // REQUIRES complete pair semantics under the skew cap: a
    // star-degraded mega-bucket emits only (rep, member) pairs whose
    // connectivity survives a keep-first rule but NOT a pair-level
    // Jaccard filter (two mutual near-dups reachable only through a
    // dissimilar star rep would silently split into two components and
    // both survive — straddling the split). The triangle-distributed
    // complete path keeps per-task cost bounded by maxBucket² while
    // emitting the exact pair set.
    val cand =
      if (maxBucket > 0)
        Dedup.minhashCandidatePairsComplete(deduped, textCol, idCol,
          k = 3, numHashes = 16, bands = 4, portable, maxBucket)
      else
        Dedup.minhashCandidatePairs(deduped, textCol, idCol,
          k = 3, numHashes = 16, bands = 4, portable, maxBucket = 0)
    val confirmed = Dedup.ngramJaccardScaled(deduped, cand, textCol, idCol,
        k = 2, portable = portable)
      .filter(col("jaccard_e4") >= jaccardThresholdE4)
      .select("doc_a", "doc_b")
    val clusters = Components.dedupClusters(deduped, confirmed, idCol)
    val reps = clusters.filter(col("kept") === 1L)
      .select(col(idCol), col("component"))
    // 4. decontamination of the representatives against the eval set
    val repDocs = deduped.join(reps.select(idCol), Seq(idCol), "left_semi")
    val clean = Curation.contamination(train = eval, test = repDocs,
        textCol, idCol, k = contamK, portable = portable)
      .filter(col("contam_e4") < maxContamE4)
      .select(idCol)
    // 5. leakage-safe split on the component id — checkpointed: the
    // packing input and the trailing component join both read it, and
    // its lineage carries the contamination shingle join (re-deriving
    // that per consumer would double the most expensive stage)
    val split = Curation.leakageSafeSplit(
        reps.join(clean, Seq(idCol), "left_semi"))
      .select(col(idCol), col("component"), col("split"))
      .localCheckpoint(eager = false)
    // 6. pack within each split
    Curation.packSequences(
        repDocs.join(split, Seq(idCol)), budget = packBudget,
        shardCol = "split", idCol = idCol, textCol = textCol)
      .join(split.select(col(idCol), col("component")), Seq(idCol))
      .select(col(idCol), col("component"), col("split"),
        col("n_tokens"), col("bin"), col("offset"))
  }
}
