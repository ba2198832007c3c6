package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen; no UDFs) — every
  * ratio is emitted as an integer scaled by 1e4 so results are
  * bit-identical across engines (the DuckDB oracle replicates the exact
  * arithmetic; a single IEEE double division is deterministic).
  */
object TextAnalysis {

  /** Normalization used before hashing/dedup: lowercase, trim, collapse
    * whitespace runs. */
  def normalizeCol(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Whitespace tokens (array<string>). */
  def wordsCol(text: Column): Column = split(normalizeCol(text), " ")

  /** Whitespace token count. */
  def tokenCountCol(text: Column): Column = size(wordsCol(text))

  /** Adjacent-word bigrams of a word-array column `ws` as an array of
    * (w1, w2) structs — empty for 0/1-word arrays (transform over the
    * tail slice, so no descending-`sequence` edge case). Shared by the
    * bigram-LM (q95/q102) and collocation (q106) operators so the
    * bigram shape cannot drift between them. */
  def bigramsOf(ws: String): Column = expr(
    s"transform(slice($ws, 2, greatest(size($ws) - 1, 0)), " +
      s"(w2, i) -> struct(element_at($ws, i + 1) AS w1, w2 AS w2))")

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric glyphs each count as one token — the standard cheap
    * pre-tokenizer approximation. */
  def bpeTokenCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation ratio ×1e4 as bigint (punct glyphs / total chars). */
  def punctRatioScaledCol(text: Column): Column =
    floor(size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))
      .cast("double") * lit(10000.0) / greatest(length(text), lit(1)).cast("double"))
      .cast("long")

  /** Mean word length ×1e4 as bigint. */
  def meanWordLenScaledCol(text: Column): Column = {
    val w = wordsCol(text)
    floor(aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double")
      * lit(10000.0) / greatest(size(w), lit(1)).cast("double")).cast("long")
  }

  /** Stopword-hit count for one language: whole-word occurrences of each
    * marker word, counted with the replace-length trick (portable to any
    * SQL engine; no regex dialect drift). The text is space-padded and
    * every boundary space doubled so adjacent occurrences ("the the")
    * don't share a delimiter and non-overlapping replace counts exactly. */
  def stopwordHitsCol(text: Column, stopwords: Seq[String]): Column = {
    val padded = concat(lit(" "), normalizeCol(text), lit(" "))
    val doubled = regexp_replace(padded, " ", "  ")
    stopwords.map { sw =>
      val tok = s" $sw " // alphanumeric marker — no regex metachars
      ((length(doubled) - length(regexp_replace(doubled, tok, "")))
        / lit(tok.length)).cast("long")
    }.reduce(_ + _)
  }

  /** Language markers — tiny per-language stopword lists for the n-gram /
    * stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "nl" -> Seq("de", "het", "een", "en", "van"))

  /** Predicted language = argmax over marker-hit counts. Scores are
    * encoded as zero-padded "%08d:%s" strings so the argmax is a plain
    * lexicographic `greatest` — deterministic tie-break (highest language
    * code wins) and portable verbatim to the SQL oracle. 'und' when
    * nothing hits. */
  def langIdCol(text: Column): Column = {
    val scored = langMarkers.map { case (lang, words) =>
      format_string("%08d:%s", stopwordHitsCol(text, words), lit(lang))
    }
    val best = greatest(scored: _*)
    when(substring(best, 1, 8) =!= "00000000",
      substring(best, 10, 2)).otherwise(lit("und"))
  }

  /** Composite quality score ×1e4: rewards mid-length docs and real
    * punctuation, penalizes very short docs — a cheap heuristic in the
    * spirit of Gopher/C4 quality rules, fully expression-based. */
  def qualityScoreScaledCol(text: Column): Column = {
    val n = tokenCountCol(text).cast("double")
    val lenScore = least(n / lit(50.0), lit(1.0))
    val punct = punctRatioScaledCol(text).cast("double") / lit(10000.0)
    val punctScore = least(punct * lit(20.0), lit(1.0))
    floor((lenScore * lit(0.7) + punctScore * lit(0.3)) * lit(10000.0)).cast("long")
  }

  /** Document fingerprint: portable polynomial rolling hash of the
    * normalized text (Hashing.polyHashCol) — stable across engines and
    * runs, unlike xxhash64 which is Spark-specific (use
    * `xxhash64(normalizeCol(text))` on the 100 TB path where cross-engine
    * reproducibility is not required). */
  def fingerprintCol(text: Column): Column =
    Hashing.polyHashCol(normalizeCol(text))

  // ---- compiled batch stats (hot path) --------------------------------

  /** Driver/executor-side normalization — replicates normalizeCol exactly:
    * lowercase, trim SPACES only (Spark/DuckDB `trim` strips ' ', not all
    * whitespace), collapse \s+ runs. */
  def normalize(text: String): String = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val trimmed = lower.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    trimmed.replaceAll("\\s+", " ")
  }

  private val bpePattern =
    java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
  private val punctPattern = java.util.regex.Pattern.compile("[.,;:!?]")

  private def countMatches(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  /** All per-document stats in one compiled pass — the arithmetic
    * replicates the Column versions above operation-for-operation (same
    * IEEE order, same floor/scale), which the DuckDB oracle also
    * replicates; the Column↔compiled equivalence is scalatested. The
    * interpreted-HOF Column path costs ~ms/doc (fingerprint + mean-length
    * folds); this is the 100 TB path. */
  def stats(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = langMarkers.map { case (l, ws) => (l, ws.toSet) }
    val prepped = graft.sources.Tables.widen(
      docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
    prepped.as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val norm = normalize(text)
        val words = norm.split(" ", -1)
        val nTok = words.length.toLong
        val nBpe = countMatches(bpePattern, text)
        val punct = math.floor(countMatches(punctPattern, text).toDouble
          * 10000.0 / math.max(text.length, 1).toDouble).toLong
        var wl = 0L
        words.foreach(w => wl += w.length)
        val meanLen = math.floor(wl.toDouble * 10000.0
          / math.max(words.length, 1).toDouble).toLong
        val lenScore = math.min(nTok.toDouble / 50.0, 1.0)
        val punctScore = math.min(punct.toDouble / 10000.0 * 20.0, 1.0)
        val quality = math.floor((lenScore * 0.7 + punctScore * 0.3) * 10000.0).toLong
        // argmax over "%08d:lang" strings — identical tie-break to the
        // Column/oracle lexicographic greatest
        val scored = markers.map { case (lang, ws) =>
          f"${words.count(ws.contains)}%08d:$lang"
        }
        val best = scored.max
        val lang = if (!best.startsWith("00000000")) best.substring(9, 11) else "und"
        (id, nTok, nBpe, punct, meanLen, quality, lang,
          graft.functions.Hashing.polyHash(norm))
      })
      .toDF(idCol, "n_tokens", "n_bpe_tokens", "punct_ratio_e4",
        "mean_word_len_e4", "quality_e4", "lang_pred", "fingerprint")
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    * use line/paragraph/n-gram duplicate fractions as quality gates;
    * this corpus is single-line, so the word/bigram variants carry the
    * signal): distinct-word ratio, top-word fraction, top-bigram
    * fraction — ×1e4 bigints for engine-exact compares. One compiled
    * map-only pass (per-doc hash counting is partition-local; no
    * explode/groupBy shuffle), same normalize/split convention as
    * [[stats]] and the q54 oracle. */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val prepped = graft.sources.Tables.widen(
      docs.select(col(idCol).cast("long"), col(textCol).cast("string")))
    prepped.as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val words = normalize(text).split(" ", -1)
        val n = words.length.toLong
        val wc = scala.collection.mutable.HashMap.empty[String, Long]
        words.foreach(w => wc.update(w, wc.getOrElse(w, 0L) + 1L))
        var topW = 0L
        wc.valuesIterator.foreach(c => if (c > topW) topW = c)
        val bc = scala.collection.mutable.HashMap.empty[String, Long]
        var i = 0
        while (i < words.length - 1) {
          val b = words(i) + " " + words(i + 1)
          bc.update(b, bc.getOrElse(b, 0L) + 1L)
          i += 1
        }
        var topB = 0L
        bc.valuesIterator.foreach(c => if (c > topB) topB = c)
        (id, n,
          math.floor(wc.size.toDouble * 10000.0 / n.toDouble).toLong,
          math.floor(topW.toDouble * 10000.0 / n.toDouble).toLong,
          math.floor(topB.toDouble * 10000.0
            / math.max(n - 1, 1L).toDouble).toLong)
      })
      .toDF(idCol, "n_words", "distinct_ratio_e4", "top_word_e4",
        "top_bigram_e4")
  }
}
