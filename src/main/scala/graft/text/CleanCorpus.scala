package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the C4/RefinedWeb recipe shape
  * composed from this module's audited operators:
  *
  *   1. quality gate: keep documents with quality score >= `minQualityE4`
  *      and predicted language in `langs` (TextAnalysis.stats);
  *   2. exact dedup: keep the lowest-id document per normalized content
  *      hash (Dedup.exact);
  *   3. near-dup removal: MinHash-LSH candidate pairs scored with n-gram
  *      Jaccard; any document whose similarity to a LOWER-id document
  *      reaches `jaccardThresholdE4` is dropped (greedy — keeps the
  *      lowest id of each confirmed near-dup pair; deterministic and
  *      closed-form, unlike connected-components clustering).
  *
  * Every stage is shuffle-bucketed (stats map-only; dedup one hash
  * shuffle; candidates band-bucketed with the default skew guard), so
  * the composition inherits the per-operator scale properties. The whole
  * pipeline is DuckDB-oracle-checkable (q42).
  */
object CleanCorpus {

  /** Shared stages 1-2 of the cleaning/training pipelines: quality +
    * language gate, then exact dedup (keep-first per content hash).
    * The surviving corpus is the artifact every later stage reads
    * (candidate gen, Jaccard confirm, anti-join / clustering /
    * contamination) — lazily checkpointed so the gate regexes + dedup
    * window run ONCE, not once per consumer (verified: without it the
    * composed plan scans the corpus 4x). Materializing the kept corpus
    * once beats the re-derivations at any scale; a production pipeline
    * would write this stage out anyway. One definition serves both
    * [[clean]] and [[TrainingData.prepare]] so the gate semantics
    * cannot drift. */
  private[text] def gatedDeduped(docs: DataFrame, minQualityE4: Long,
                                 langs: Seq[String], textCol: String,
                                 idCol: String): DataFrame = {
    val keep = TextAnalysis.stats(docs, textCol, idCol)
      .filter(col("quality_e4") >= minQualityE4
        && col("lang_pred").isin(langs: _*))
      .select(idCol)
    val gated = docs.join(keep, Seq(idCol), "left_semi")
    Dedup.exact(gated, textCol, idCol).localCheckpoint(eager = false)
  }

  def clean(docs: DataFrame,
            minQualityE4: Long = 3000,
            langs: Seq[String] = Seq("en"),
            jaccardThresholdE4: Long = 6000,
            shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
            jaccardK: Int = 2,
            textCol: String = "text", idCol: String = "doc_id",
            portable: Boolean = true, maxBucket: Int = 1000): DataFrame = {
    // 1-2. quality/language gate + exact dedup (shared prelude)
    val deduped = gatedDeduped(docs, minQualityE4, langs, textCol, idCol)
    // 3. near-dup removal over the deduped survivors
    val pairs = Dedup.minhashCandidatePairs(deduped, textCol, idCol,
      shingleK, numHashes, bands, portable, maxBucket)
    val confirmed = Dedup.ngramJaccardScaled(deduped, pairs, textCol, idCol,
        jaccardK, portable)
      .filter(col("jaccard_e4") >= jaccardThresholdE4)
    val drop = confirmed.select(col("doc_b").as(idCol)).distinct()
    deduped.join(drop, Seq(idCol), "left_anti")
  }
}
