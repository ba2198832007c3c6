package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join — the dedup shape for near-identical
  * identifiers/filenames (the reference's archives are full of
  * `NL-WbDRAZU-...-123` ids where one typo'd digit is a real-world
  * duplicate; razu/identifiers.py builds such ids).
  *
  * FastSS deletion-neighborhood blocking: two strings are within edit
  * distance 1 iff they are equal, or one equals a single-character
  * deletion of the other, or they share a same-position deletion (one
  * substitution). So the variant set {s} ∪ {s minus one char} is a
  * LOSSLESS blocking key for k=1: every qualifying pair shares ≥1
  * variant, and a final exact `levenshtein` re-check removes the
  * false positives.
  *
  * Scale shape: |s|+1 compact (id, variant-hash) rows per string —
  * explode, equi-join on the hash, dedup pairs, re-check. No cross
  * product anywhere (PlanSpec-style assertion in FuzzySpec); the
  * candidate exchange carries hashes + short strings, and the join is
  * hash-partitioned on the variant — parallel across blocks at any
  * corpus size. Same skew note as MinHash LSH: a pathological variant
  * shared by millions of strings would need the mega-bucket cap
  * treatment (graft.text.Dedup), fine for identifier-length keys.
  */
object Fuzzy {

  /** All unordered pairs (a_id < b_id) with levenshtein(a,b) ≤ 1,
    * including exact duplicates (dist 0). Output:
    * (a_id, b_id, dist). */
  def editDistanceJoin1(df: DataFrame, idCol: String,
                        strCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val variants = graft.sources.Tables.widen(
        df.select(col(idCol).cast("long"), col(strCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, s) =>
        val dels = (0 until s.length).iterator
          .map(i => s.substring(0, i) + s.substring(i + 1))
        (Iterator.single(s) ++ dels).toSeq.distinct
          .iterator.map(v => (id, s, v))
      })
      .toDF("id", "s", "v")
      // both self-join sides consume the neighborhood table; the typed
      // mapPartitions blocks exchange reuse (verified: ReusedExchange=0
      // without this), so the lazy checkpoint materializes the narrow
      // (id, s, variant) rows ONCE instead of generating them per side
      .localCheckpoint(eager = false)
    val a = variants.toDF("a_id", "a_s", "v")
    val b = variants.toDF("b_id", "b_s", "v")
    a.join(b, Seq("v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "a_s", "b_id", "b_s")
      .distinct()
      .filter(levenshtein(col("a_s"), col("b_s")) <= 1)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_s"), col("b_s")).cast("long").as("dist"))
  }
}
