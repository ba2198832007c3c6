package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Filtered search on the PQ-COMPRESSED index family: the probe
  * predicate must apply to the code scan BEFORE the ADC sum (exact
  * pre-filtered semantics — the [[FilteredAnnSpec]] contract, carried
  * to codes), reach the pruned scan as a pushed filter, flow through
  * the full rerank serving stack, and survive a codebook refresh from
  * the companion vn index. */
class FilteredPqSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 64
  private val coarse = Pinned.ivfCentroids(8, dim)
  private val books = Pinned.pqBooks()

  private def vecs(lo: Int, hi: Int) = (lo until hi)
    .map(i => (i.toLong, Array.tabulate(dim)(d =>
      math.sin(i * 0.37 + d * 0.61) + 0.1)))
    .toDF("id", "vec")
    .withColumn("grp", pmod(col("id"), lit(5)))

  test("pre-filtered ADC top-k is exact; post-filtering under-delivers") {
    val table = "graft_fpq_exact_idx"
    try {
      IncrementalPq.buildIndex(vecs(0, 200), table, 4, coarse, books,
        attrCols = Seq("grp"))
      val q = vecs(500, 506).drop("grp")
      val filtered = IncrementalPq.probe(spark, q, table, coarse, books,
          k = 5, nProbe = coarse.length, filter = Some(col("grp") === 2))
        .select("query_id", "neighbor_id", "adc_e6", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      // reference: filter the FULL ADC ranking (k = corpus) then take
      // the top 5 per query — "top-k among matching rows"
      val full = IncrementalPq.probe(spark, q, table, coarse, books,
          k = 200, nProbe = coarse.length)
        .select("query_id", "neighbor_id", "adc_e6")
        .as[(Long, Long, Long)].collect()
      val expected = full.filter(_._2 % 5 == 2)
        .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
          rs.sortBy { case (_, n, a) => (-a, n) }.take(5).zipWithIndex
            .map { case ((qid, n, a), i) => (qid, n, a, i + 1) }
        }.toSet
      assert(filtered == expected && filtered.nonEmpty)
      // the pitfall: post-filtering the unfiltered top-5 loses rows
      // whenever non-matching neighbours crowd the window — assert the
      // fixture actually exercises it
      val postFiltered = IncrementalPq.probe(spark, q, table, coarse,
          books, k = 5, nProbe = coarse.length)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
        .filter(_._2 % 5 == 2)
      assert(postFiltered.size < filtered.size,
        s"fixture too easy: post-filtering lost nothing " +
          s"(${postFiltered.size} vs ${filtered.size})")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("the attribute predicate reaches the code scan as a pushed filter") {
    val table = "graft_fpq_plan_idx"
    try {
      IncrementalPq.buildIndex(vecs(0, 200), table, 4, coarse, books,
        attrCols = Seq("grp"))
      val df = IncrementalPq.probe(spark, vecs(500, 501).drop("grp"),
        table, coarse, books, k = 3, nProbe = 2,
        filter = Some(col("grp") === 2))
      val plan = df.queryExecution.executedPlan.toString
      // EqualTo(...) formatting only appears in the scan's
      // PushedFilters (the Filter node prints `grp = 2`)
      assert(plan.contains("EqualTo(grp,2)"),
        s"attr predicate not pushed to the code scan:\n$plan")
      assert(df.count() > 0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("filtered rerank equals the full-vector filtered probe when the shortlist covers") {
    val codeT = "graft_fpq_rr_codes"
    val vnT = "graft_fpq_rr_vn"
    try {
      val corpus = vecs(0, 200)
      IncrementalPq.buildIndex(corpus, codeT, 4, coarse, books,
        attrCols = Seq("grp"))
      IncrementalAnn.buildIndex(corpus, vnT, 4, coarse,
        attrCols = Seq("grp"))
      val q = vecs(500, 505).drop("grp")
      // ~40 of 200 rows match grp=2; rerankFactor 10 → shortlist 50
      // covers every match, so the exact re-rank must EQUAL the
      // full-vector index's filtered probe (same DotE6 contract)
      val got = IncrementalPq.probeRerank(spark, q, codeT, vnT, coarse,
          books, k = 5, nProbe = coarse.length, rerankFactor = 10,
          filter = Some(col("grp") === 2))
        .select("query_id", "neighbor_id", "cos_e6", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      val expected = IncrementalAnn.probe(spark, q, vnT, coarse,
          k = 5, nProbe = coarse.length, filter = Some(col("grp") === 2))
        .select("query_id", "neighbor_id", "cos_e6", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $codeT")
      spark.sql(s"DROP TABLE IF EXISTS $vnT")
    }
  }

  test("attributes survive a refresh from the vn index with their codes") {
    val codeT = "graft_fpq_refresh_codes"
    val vnT = "graft_fpq_refresh_vn"
    val freshT = "graft_fpq_refresh_fresh"
    val coarseB = Pinned.ivfCentroids(8, dim, salt = "r-")
    val booksB = Pinned.pqBooks(salt = "r-")
    try {
      val corpus = vecs(0, 200)
      IncrementalPq.buildIndex(corpus, codeT, 4, coarse, books,
        attrCols = Seq("grp"))
      IncrementalAnn.buildIndex(corpus, vnT, 4, coarse,
        attrCols = Seq("grp"))
      // refresh the code table under codebook set B from the attr-
      // carrying companion — the corpus is never re-read, yet the
      // FILTERED serving path must come out identical to a fresh
      // attr build under B
      IncrementalPq.refreshFromVnIndex(spark, codeT, vnT, coarseB,
        booksB, attrCols = Seq("grp"))
      IncrementalPq.buildIndex(corpus, freshT, 4, coarseB, booksB,
        attrCols = Seq("grp"))
      val q = vecs(500, 505).drop("grp")
      def probeOf(t: String) = IncrementalPq
        .probe(spark, q, t, coarseB, booksB, k = 5, nProbe = 3,
          filter = Some(col("grp") === 1))
        .select("query_id", "neighbor_id", "adc_e6", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(probeOf(codeT) == probeOf(freshT) && probeOf(codeT).nonEmpty,
        "filtered probe after refresh must equal a fresh attr build")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $codeT")
      spark.sql(s"DROP TABLE IF EXISTS $vnT")
      spark.sql(s"DROP TABLE IF EXISTS $freshT")
    }
  }
}
