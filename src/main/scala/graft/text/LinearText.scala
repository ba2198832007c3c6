package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Hashed-linear text classifier SERVING — the fastText-style quality
  * filter every modern curation pipeline runs over the whole corpus
  * (DCLM / FineWeb-edu shape): the model is ONE weight vector over
  * hashed unigram+bigram buckets, and scoring a document is a bag-of-
  * grams weight sum. Training is out of scope (any logistic trainer
  * exports such weights); what matters at 100 TB is the serving shape:
  * the weight vector broadcasts (a few hundred KB), the corpus is
  * scored in ONE map-only compiled pass — no explode, no shuffle, no
  * join — and the accept/score columns drop straight into the gate
  * stage of TrainingData.prepare.
  *
  * Determinism: buckets come from the portable squareMix(polyHash)
  * scatter and the score is an integer sum of e6-scaled weights —
  * order-free, so the q124 oracle (with the weight table pinned to the
  * shared generator) hash-matches bit-for-bit.
  */
object LinearText {

  /** Bucket of a gram under the portable scatter. */
  def bucket(gram: String, m: Int): Int =
    (Hashing.squareMix(Hashing.polyHash(gram)) % m).toInt

  private val P = Hashing.P

  /** Unboxed polyHash (identical values to [[Hashing.polyHash]], which
    * is a per-char boxed foldLeft meant for driver-side use — this is
    * the corpus-wide hot loop). */
  private def polyFast(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
    h
  }

  /** 31^len(s) mod P — the multiplier that continues a rolling
    * polynomial hash across `s` without re-walking its characters:
    * poly(a ++ s) = (polyState(a) · pow + poly(s)) mod P. */
  private def pow31(len: Int): Long = {
    var m = 1L
    var i = 0
    while (i < len) { m = m * 31 % P; i += 1 }
    m
  }

  /** Pinned pseudo-random weight table for the oracle-checked
    * companion: w(b) = squareMix(polyHash("w:b")) mod 2001 − 1000,
    * i.e. integers in [−1000, 1000] (e6 scale). */
  def pinnedWeightsE6(m: Int = 4096): Array[Long] =
    Array.tabulate(m)(b =>
      Hashing.squareMix(Hashing.polyHash(s"w:$b")) % 2001L - 1000L)

  /** Score every document: (idCol, n_tokens, score_e6, accept) where
    * score_e6 = bias + Σ w(bucket(unigram)) [+ Σ w(bucket(bigram))]
    * over the whitespace tokens of the normalized text, and accept =
    * score_e6 >= 0. Zero-token documents score `bias` exactly. */
  def scoreHashed(docs: DataFrame, weightsE6: Array[Long],
                  biasE6: Long = 0L, textCol: String = "text",
                  idCol: String = "doc_id",
                  bigrams: Boolean = true): DataFrame = {
    require(weightsE6.length >= 2, "need at least 2 weight buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(weightsE6)
    val useBigrams = bigrams
    val bias = biasE6
    graft.sources.Tables.widen(
        docs.select(col(idCol).cast("long"),
          TextAnalysis.normalizeCol(col(textCol)).as("__norm")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val w = bc.value
        val m = w.length
        it.map { case (id, norm) =>
          val ws = norm.split(" ", -1).filter(_.nonEmpty)
          // hash each token once; bigram hashes CONTINUE the rolling
          // polynomial across the space instead of concatenating:
          // poly("a b") = ((poly(a)·31 + ' ') · 31^len(b) + poly(b)) mod P
          // — same values as the naive form (spec-pinned), no per-pair
          // string allocation, no second walk over the characters
          val ph = new Array[Long](ws.length)
          val pw = new Array[Long](ws.length)
          var i = 0
          while (i < ws.length) {
            ph(i) = polyFast(ws(i))
            pw(i) = pow31(ws(i).length)
            i += 1
          }
          var score = bias
          i = 0
          while (i < ws.length) {
            score += w((Hashing.squareMix(ph(i)) % m).toInt)
            i += 1
          }
          if (useBigrams) {
            var j = 0
            while (j < ws.length - 1) {
              val afterSpace = (ph(j) * 31 + ' ') % P
              val h = (afterSpace * pw(j + 1) + ph(j + 1)) % P
              score += w((Hashing.squareMix(h) % m).toInt)
              j += 1
            }
          }
          (id, ws.length.toLong, score, score >= 0L)
        }
      }
      .toDF(idCol, "n_tokens", "score_e6", "accept")
  }
}
