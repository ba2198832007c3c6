package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: learned merges trained on a corpus
  * sample, applied distributed — the real-tokenizer upgrade over the
  * whitespace/regex token counts in [[TextAnalysis]] (a training-data
  * pipeline budgets, packs, and mixes by TOKENIZER counts, not word
  * counts).
  *
  * Train/serve split mirrors production tokenizer practice (HF
  * tokenizers, sentencepiece train on a bounded sample, never the full
  * corpus): [[train]] folds a deterministic hash-sampled slice into a
  * word-frequency table — a distributed explode → count, with only the
  * distinct-word table collected (bounded: sample vocab, not sample
  * rows) — then runs classic BPE merge learning driver-side (argmax
  * adjacent-pair count, ties to the lexicographically smaller pair, so
  * training is deterministic). [[encode]] broadcasts the merge ranks
  * and tokenizes in ONE map-only compiled pass — the same
  * bounded-model-state shape as Curation.lmScore / bloomDecontaminate.
  *
  * Tokens use the `</w>` end-of-word marker convention (original BPE,
  * Sennrich et al. 2016 — public algorithm).
  */
object Bpe {

  type Merge = (String, String)

  /** Learn `nMerges` BPE merges from the hash-sampled slice of `docs`
    * (md5 prefix < `sampleHexCeil`, the Curation.hashSample criterion —
    * reproducible, engine-portable). Driver state: the sampled
    * word-frequency table + symbol sequences (vocab-bounded). */
  def train(docs: DataFrame, nMerges: Int, sampleHexCeil: String = "40",
            textCol: String = "text", idCol: String = "doc_id"): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts: Array[(String, Long)] =
      Curation.hashSample(docs, idCol, sampleHexCeil)
        .select(explode(TextAnalysis.wordsCol(col(textCol))).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("c"))
        .as[(String, Long)].collect()
    trainFromCounts(wordCounts, nMerges)
  }

  /** The classic BPE learner over a word-frequency table (driver-side;
    * the table is the bounded model state). Exposed for specs. */
  def trainFromCounts(wordCounts: Array[(String, Long)],
                      nMerges: Int): Seq[Merge] = {
    // each word as its symbol sequence, last symbol marked with </w>
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      val chars = w.map(_.toString).toArray
      chars(chars.length - 1) = chars(chars.length - 1) + "</w>"
      (chars, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    while (i < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[Merge, Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) i = nMerges
      else {
        // argmax count, ties to the lexicographically smaller pair —
        // deterministic regardless of hash-map iteration order
        val best = pairCounts.foldLeft(Option.empty[(Merge, Long)]) {
          case (None, e) => Some(e)
          case (acc @ Some((bp, bc)), (p, c)) =>
            if (c > bc || (c == bc && (p._1 < bp._1 ||
                (p._1 == bp._1 && p._2 < bp._2)))) Some((p, c)) else acc
        }.get._1
        merges += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
        i += 1
      }
    }
    merges.toSeq
  }

  private def applyMerge(syms: Array[String], m: Merge): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Tokenize a single word (without marker) against ranked merges —
    * repeatedly apply the lowest-rank applicable merge, exactly the
    * greedy BPE encode. Exposed for specs. */
  def encodeWord(w: String, rank: Map[Merge, Int]): Array[String] = {
    if (w.isEmpty) return Array.empty
    var syms = w.map(_.toString).toArray
    syms(syms.length - 1) = syms(syms.length - 1) + "</w>"
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else syms = applyMerge(syms, (syms(bestIdx), syms(bestIdx + 1)))
    }
    syms
  }

  /** Distributed encode: one map-only compiled pass with the merge
    * table broadcast. Output: (idCol, n_tokens, n_chars_tokenized,
    * tokens_fp — a portable polynomial fingerprint of the token stream,
    * so downstream dedup/packing can key on tokenization identity). */
  def encode(docs: DataFrame, merges: Seq[Merge],
             textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    graft.sources.Tables.widen(
        docs.select(col(idCol).cast("long"),
          TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (id, norm) =>
          val ws = norm.split(" ", -1)
          var nTok = 0L; var nChars = 0L; var fp = 0L
          var i = 0
          while (i < ws.length) {
            if (ws(i).nonEmpty) {
              val toks = encodeWord(ws(i), r)
              nTok += toks.length
              var k = 0
              while (k < toks.length) {
                val t = toks(k)
                nChars += t.length
                var h = 0L
                var c = 0
                while (c < t.length) { h = (h * 31 + t.charAt(c)) % 1000000007L; c += 1 }
                fp = (fp * 131 + h) % 1000000007L
                k += 1
              }
            }
            i += 1
          }
          (id, nTok, nChars, fp)
        }
      }
      .toDF(idCol, "n_tokens", "n_chars_tokenized", "tokens_fp")
  }
}
