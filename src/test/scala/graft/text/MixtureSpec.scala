package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Stride-scheduled mixture ordering: positions must equal the
  * from-scratch virtual-time schedule, every prefix must carry sources
  * at their weight ratios, unweighted sources are excluded, and the
  * output must not depend on the input partitioning. */
class MixtureSpec extends SparkSuite {
  import spark.implicits._

  // 3 sources, 24 docs each; doc_id unique and interleaved across
  // sources so per-source rank != doc_id
  private def docs = (0 until 72)
    .map(i => (i.toLong, s"s${i % 3}")).toDF("doc_id", "source")
  private val weights = Map("s0" -> 3L, "s1" -> 1L, "s2" -> 2L)

  private def reference: Seq[(Long, Long, String, Long, Long)] = {
    val rows = (0 until 72).map(i => (i.toLong, s"s${i % 3}"))
      .filter { case (_, s) => weights.contains(s) }
    val ranked = rows.groupBy(_._2).toSeq.flatMap { case (s, rs) =>
      rs.sortBy(_._1).zipWithIndex.map { case ((id, _), r) =>
        (id, s, r + 1L, (r + 1L) * 720720L / weights(s))
      }
    }
    ranked.sortBy { case (_, s, r, vt) => (vt, s, r) }
      .zipWithIndex
      .map { case ((id, s, r, vt), p) => (p + 1L, id, s, r, vt) }
  }

  test("positions equal the from-scratch stride schedule") {
    val got = Mixture.interleaveBySource(docs, "source",
        Seq(col("doc_id")), weights)
      .select(col("pos"), col("doc_id"), col("source"),
        col("source_rank"), col("virtual_time"))
      .as[(Long, Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == reference, s"got=${got.take(8)}... exp=${reference.take(8)}...")
    // stride fairness: in every prefix ending at a multiple of 6 (one
    // full weight cycle of 3+1+2), sources appear EXACTLY 3:1:2
    val bySrc = got.map { case (pos, _, s, _, _) => (pos, s) }
    for (n <- Seq(6, 12, 24, 36)) {
      val pre = bySrc.filter(_._1 <= n).groupBy(_._2).view.mapValues(_.size)
      assert(pre("s0") == n / 2 && pre("s1") == n / 6 && pre("s2") == n / 3,
        s"prefix $n: ${pre.toMap}")
    }
  }

  test("unweighted sources are excluded; output ignores input partitioning") {
    val extra = docs.unionByName(
      Seq((900L, "s9"), (901L, "s9")).toDF("doc_id", "source"))
    val a = Mixture.interleaveBySource(extra, "source",
        Seq(col("doc_id")), weights)
      .select(col("pos"), col("doc_id")).as[(Long, Long)].collect().toSet
    assert(!a.exists { case (_, id) => id >= 900L })
    val b = Mixture.interleaveBySource(extra.repartition(7), "source",
        Seq(col("doc_id")), weights)
      .select(col("pos"), col("doc_id")).as[(Long, Long)].collect().toSet
    assert(a == b)
  }
}
