package graft.text

import org.apache.spark.sql.functions._

/** Pins the FastSS k=1 blocking against a brute-force oracle on planted
  * cases (substitution, insertion, deletion, exact dup, distance-2
  * exclusion) and the no-cartesian plan shape. */
class FuzzySpec extends graft.SparkSuite {
  import spark.implicits._

  private def strings = Seq(
    (1L, "doc_12"),   // vs doc_13 (sub), doc_1 (del), doc_112 (ins)
    (2L, "doc_13"),
    (3L, "doc_1"),
    (4L, "doc_112"),
    (5L, "doc_12"),   // exact dup of 1
    (6L, "zzzz"))     // far from everything
    .toDF("id", "name")

  test("editDistanceJoin1 == brute-force levenshtein<=1 pairs") {
    val got = Fuzzy.editDistanceJoin1(strings, "id", "name")
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val df2 = strings.toDF("b_id", "b_name")
    val want = strings.crossJoin(df2)
      .filter(col("id") < col("b_id")
        && levenshtein(col("name"), col("b_name")) <= 1)
      .select(col("id"), col("b_id"),
        levenshtein(col("name"), col("b_name")).cast("long"))
      .orderBy("id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // the planted relations are all present
    assert(got.contains((1L, 2L, 1L))) // substitution
    assert(got.contains((1L, 3L, 1L))) // deletion (wait: doc_12 -> doc_1)
    assert(got.contains((1L, 5L, 0L))) // exact duplicate
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("editDistanceJoin1: empty-string and single-char edge cases") {
    val df = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"))
      .toDF("id", "name")
    val got = Fuzzy.editDistanceJoin1(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // "" ~ "a" (ins), "" ~ "b" (ins), "a" ~ "b" (sub), "a" ~ "ab" (ins),
    // "b" ~ "ab" (ins); NOT "" ~ "ab" (dist 2)
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("editDistanceJoin1 plan has no cartesian/nested-loop join") {
    val p = Fuzzy.editDistanceJoin1(strings, "id", "name")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }
}
