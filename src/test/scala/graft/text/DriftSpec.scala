package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Corpus-drift report gates (q125 companion). */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("identical snapshots drift zero") {
    val d = Seq((1L, "alpha beta beta"), (2L, "gamma")).toDF("doc_id", "text")
    val rows = Drift.driftReport(d, d).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("disjoint snapshots drift to TV ~ 1e9; probabilities are exact") {
    val a = Seq((1L, "aa aa bb")).toDF("doc_id", "text")
    val b = Seq((2L, "cc")).toDF("doc_id", "text")
    val got = Drift.driftReport(a, b)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // p(aa|A)=floor(2e9/3), p(bb|A)=floor(1e9/3), p(cc|B)=1e9
    assert(got("aa") == ((666666666L, 0L, 666666666L, 999999999L)))
    assert(got("bb") == ((333333333L, 0L, 333333333L, 999999999L)))
    assert(got("cc") == ((0L, 1000000000L, 1000000000L, 999999999L)))
  }

  test("top-N cut orders by diff desc then token") {
    val a = Seq((1L, "x x x y z")).toDF("doc_id", "text")
    val b = Seq((2L, "y z w")).toDF("doc_id", "text")
    val toks = Drift.driftReport(a, b, topN = 2)
      .collect().map(_.getString(0)).toSeq
    assert(toks.length == 2)
    assert(toks.head == "x") // biggest mover first
  }
}
