package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring (span-level) deduplication — the "remove any ≥k-token
  * run shared across many documents" operator popularized by
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al., 2022). Document-level dedup (Dedup.exact / MinHash) keeps one
  * copy of a whole near-duplicate document; span dedup instead excises
  * REPEATED PASSAGES (boilerplate, licenses, navigation chrome) from
  * otherwise-unique documents.
  *
  * Seed-and-cover formulation, alignment-independent by construction:
  *   1. tokenize each normalized doc; emit every SLIDING k-token gram
  *      with its start position (map-only fan-out; sliding — not fixed
  *      chunks — so a shared passage is found at ANY offset);
  *   2. flag grams whose distinct-document frequency ≥ `minDocs`
  *      (one partial+final hash aggregate, shuffled on the gram);
  *   3. positions covered by any flagged gram occurrence expand to
  *      (doc, pos) rows (sequence explode, dedup);
  *   4. anti-join token positions against covered positions and
  *      reassemble the survivors in order (one shuffle on doc).
  *
  * Scale (100 TB): no all-pairs, no cross join — every stage shuffles on
  * a bounded key (gram, then (doc,pos), then doc). The flagged-gram set
  * is the REPEATED subset only (tiny vs the corpus). Shuffling literal
  * gram strings keeps the oracle exact; the wide-row optimization at
  * scale is to aggregate on xxhash64(gram) and verify the string only
  * within hash buckets (same shape the suffix-array paper's
  * hash-based implementations use).
  */
object SpanDedup {

  private def tokens(docs: DataFrame, textCol: String, idCol: String) =
    graft.sources.Tables.widen(
      docs.select(col(idCol).cast("long").as("doc"),
        split(TextAnalysis.normalizeCol(col(textCol)), " ").as("w")))

  /** (doc, start, gram): every sliding k-token gram per document,
    * 1-based start position. Docs shorter than k emit no grams (the
    * filter runs BEFORE the sequence explode — Spark's `sequence(1, n)`
    * with n < 1 would generate a DESCENDING range, not an empty one). */
  def slidingGrams(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", k: Int = 8): DataFrame =
    tokens(docs, textCol, idCol)
      .where(size(col("w")) >= k)
      .select(col("doc"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (k - 1))).as("start"))
      .select(col("doc"), col("start"),
        concat_ws(" ", slice(col("w"), col("start"), lit(k))).as("gram"))

  /** Remove every token covered by a k-gram that appears in ≥ `minDocs`
    * distinct documents; returns (doc_id, clean_text, n_removed) for
    * EVERY input document (clean_text = "" when everything was flagged).
    *
    * Shape: the only corpus-sized shuffles are the gram-frequency
    * aggregate and the final doc join — flagged occurrences collapse to
    * a per-doc START LIST (tiny: only docs carrying a repeated passage
    * appear, with a handful of offsets each; AQE broadcast-joins it in
    * practice), and the excision itself is one compiled partition-local
    * map over (doc, tokens, starts). The naïve alternative — exploding
    * to (doc, pos) token rows and anti-joining covered positions — would
    * push TWO more corpus-sized exchanges (tokens out, survivors back)
    * through the plan for the same answer. */
  def removeRepeatedSpans(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id", k: Int = 8,
                          minDocs: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = tokens(docs, textCol, idCol)
    val grams = slidingGrams(docs, textCol, idCol, k)
    val flagged = grams.groupBy("gram")
      .agg(count_distinct(col("doc")).as("df"))
      .filter(col("df") >= minDocs)
      .select("gram")
    val flaggedStarts = grams.join(flagged, Seq("gram"), "left_semi")
      .groupBy("doc").agg(collect_list(col("start")).as("starts"))
    toks.join(flaggedStarts, Seq("doc"), "left_outer")
      .select(col("doc"), col("w"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .as[(Long, Seq[String], Seq[Int])]
      .mapPartitions(_.map { case (doc, w, starts) =>
        if (starts.isEmpty) (doc, w.mkString(" "), 0L)
        else {
          val covered = new Array[Boolean](w.length)
          starts.foreach { s =>
            var i = s - 1
            val end = math.min(s - 1 + k, w.length)
            while (i < end) { covered(i) = true; i += 1 }
          }
          val kept = new scala.collection.mutable.ArrayBuffer[String](w.length)
          var i = 0
          w.foreach { word =>
            if (!covered(i)) kept += word
            i += 1
          }
          (doc, kept.mkString(" "), (w.length - kept.length).toLong)
        }
      })
      .toDF("doc_id", "clean_text", "n_removed")
  }

  /** Cross-document shared-span analytics: (doc_a, doc_b, n_shared) =
    * number of DISTINCT k-grams the pair shares, over grams with
    * distinct-doc frequency in [2, maxDf]. The df cap is the skew
    * control: a gram shared by df documents contributes df·(df−1)/2
    * pair rows, so bounding df ≤ maxDf bounds per-gram fan-out by
    * maxDf² regardless of how viral a passage is (ultra-common spans
    * carry no pairing signal anyway — same rationale as dropping
    * super-frequent spans in the suffix-array pipelines).
    *
    * Shape: the gram-bucket pattern (same as MinHash banding) — ONE
    * corpus scan, ONE shuffle of (gram, doc) into per-gram groups; each
    * group streams through a bounded distinct-doc buffer (≤ maxDf+1
    * ids: the cap that drops a viral gram also caps task memory) and
    * emits its pairs directly. The declarative alternative — distinct →
    * df-filter semi-join → self-join — planned FOUR corpus scans and
    * seven exchanges for the same answer (exchange reuse does not
    * collapse the differently-projected subtrees). */
  def sharedSpanPairs(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", k: Int = 8,
                      maxDf: Int = 200): DataFrame = {
    require(maxDf >= 2, "maxDf must be >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    slidingGrams(docs, textCol, idCol, k)
      .select(col("gram"), col("doc")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val seen = scala.collection.mutable.SortedSet.empty[Long]
        var overflow = false
        it.foreach { case (_, d) =>
          if (!overflow && !seen.contains(d)) {
            if (seen.size >= maxDf) overflow = true
            else seen += d
          }
        }
        if (overflow || seen.size < 2) Iterator.empty
        else {
          val ds = seen.toArray
          for {
            i <- ds.indices.iterator
            j <- (i + 1) until ds.length
          } yield (ds(i), ds(j))
        }
      }
      .toDF("doc_a", "doc_b")
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
  }
}
