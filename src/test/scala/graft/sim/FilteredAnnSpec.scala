package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Filtered vector search: the probe predicate must apply BEFORE the
  * top-k (exact pre-filtered semantics), reach the index scan as a
  * pushed filter, and survive a codebook refresh together with its
  * attribute columns. */
class FilteredAnnSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 16
  private val cents = Pinned.ivfCentroids(8, dim)

  private def vecs(lo: Int, hi: Int) = (lo until hi)
    .map(i => (i.toLong, Array.tabulate(dim)(d =>
      math.sin(i * 0.37 + d * 0.61) + 0.1)))
    .toDF("id", "vec")
    .withColumn("grp", pmod(col("id"), lit(5)))

  test("pre-filtered top-k is exact; post-filtering the unfiltered top-k is not") {
    val table = "graft_fann_exact_idx"
    try {
      val corpus = vecs(0, 200)
      IncrementalAnn.buildIndex(corpus, table, 4, cents,
        attrCols = Seq("grp"))
      val q = vecs(500, 506).drop("grp")
      val filtered = IncrementalAnn.probe(spark, q, table, cents,
          k = 5, nProbe = 8, filter = Some(col("grp") === 2))
        .select("query_id", "neighbor_id", "cos_e6", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      // reference: filter the FULL ranking (k = corpus) then take the
      // top 5 per query — the semantics "top-k among matching rows"
      val full = IncrementalAnn.probe(spark, q, table, cents,
          k = 200, nProbe = 8)
        .select("query_id", "neighbor_id", "cos_e6")
        .as[(Long, Long, Long)].collect()
      val expected = full.filter(_._2 % 5 == 2)
        .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
          rs.sortBy { case (_, n, c) => (-c, n) }.take(5).zipWithIndex
            .map { case ((qid, n, c), i) => (qid, n, c, i + 1) }
        }.toSet
      assert(filtered == expected && filtered.nonEmpty)
      // the pitfall this feature exists to avoid: post-filtering the
      // unfiltered top-5 loses rows whenever non-matching neighbours
      // crowd the window — assert the fixture actually exercises it
      val postFiltered = IncrementalAnn.probe(spark, q, table, cents,
          k = 5, nProbe = 8)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
        .filter(_._2 % 5 == 2)
      assert(postFiltered.size < filtered.size,
        s"fixture too easy: post-filtering lost nothing " +
          s"(${postFiltered.size} vs ${filtered.size})")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("the attribute predicate reaches the index scan as a pushed filter") {
    val table = "graft_fann_plan_idx"
    try {
      IncrementalAnn.buildIndex(vecs(0, 200), table, 4, cents,
        attrCols = Seq("grp"))
      val df = IncrementalAnn.probe(spark, vecs(500, 501).drop("grp"),
        table, cents, k = 3, nProbe = 2, filter = Some(col("grp") === 2))
      val plan = df.queryExecution.executedPlan.toString
      // EqualTo(...) formatting only appears in the scan's
      // PushedFilters (the Filter node prints `grp = 2`)
      assert(plan.contains("EqualTo(grp,2)"),
        s"attr predicate not pushed to the index scan:\n$plan")
      assert(df.count() > 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("attributes survive a codebook refresh with their postings") {
    val tableR = "graft_fann_refresh_idx"
    val tableF = "graft_fann_fresh_idx"
    val centsB = Pinned.ivfCentroids(8, dim, salt = "r-")
    try {
      val corpus = vecs(0, 200)
      IncrementalAnn.buildIndex(corpus, tableR, 4, cents,
        attrCols = Seq("grp"))
      IncrementalAnn.reassignIndex(spark, tableR, centsB)
      IncrementalAnn.buildIndex(corpus, tableF, 4, centsB,
        attrCols = Seq("grp"))
      val q = vecs(500, 505).drop("grp")
      def probeOf(t: String) = IncrementalAnn
        .probe(spark, q, t, centsB, k = 5, nProbe = 3,
          filter = Some(col("grp") === 1))
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(probeOf(tableR) == probeOf(tableF) && probeOf(tableR).nonEmpty,
        "filtered probe after refresh must equal a fresh attr build")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tableR")
      spark.sql(s"DROP TABLE IF EXISTS $tableF")
    }
  }
}
