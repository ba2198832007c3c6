package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The run-forever index lifecycle END TO END: every maintenance op is
  * individually spec-pinned, but a production index runs them in
  * sequence against one table — build, append, erase, codebook
  * refresh, compact — and the probes (plain and filtered) must stay
  * exact through every transition. This is the integration the
  * per-op specs cannot see: e.g. a delete AFTER a refresh must erase
  * under the NEW keys, and compaction after the full sequence must
  * change nothing but the file layout. */
class IndexLifecycleSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 16
  private val table = "graft_lifecycle_idx"
  private val centsA = Pinned.ivfCentroids(8, dim)
  private val centsB = Pinned.ivfCentroids(8, dim, salt = "r-")

  private def vecs(lo: Int, hi: Int) = (lo until hi)
    .map(i => (i.toLong, Array.tabulate(dim)(d =>
      math.sin(i * 0.37 + d * 0.61) + 0.1)))
    .toDF("id", "vec")
    .withColumn("grp", pmod(col("id"), lit(5)))

  test("build -> append -> delete -> refresh -> compact keeps probes exact throughout") {
    try {
      val q = vecs(500, 506).drop("grp")
      def probeIds(cents: Array[Array[Double]],
                   filtered: Boolean): Set[Long] = IncrementalAnn
        .probe(spark, q, table, cents, k = 5, nProbe = 8,
          filter = if (filtered) Some(col("grp") === 2) else None)
        .select("neighbor_id").as[Long].collect().toSet
      // reference: the same probe against a FRESH single-shot build of
      // whatever the lifecycle says the index should now contain
      def freshIds(corpus: org.apache.spark.sql.DataFrame,
                   cents: Array[Array[Double]],
                   filtered: Boolean): Set[Long] = {
        val t2 = s"${table}_ref"
        try {
          IncrementalAnn.buildIndex(corpus, t2, 4, cents,
            attrCols = Seq("grp"))
          IncrementalAnn
            .probe(spark, q, t2, cents, k = 5, nProbe = 8,
              filter = if (filtered) Some(col("grp") === 2) else None)
            .select("neighbor_id").as[Long].collect().toSet
        } finally spark.sql(s"DROP TABLE IF EXISTS $t2")
      }
      // 1. build + 2 appends (multi-file buckets)
      IncrementalAnn.buildIndex(vecs(0, 100), table, 4, centsA,
        attrCols = Seq("grp"))
      IncrementalAnn.appendToIndex(vecs(100, 160), table, 4, centsA,
        attrCols = Seq("grp"))
      IncrementalAnn.appendToIndex(vecs(160, 200), table, 4, centsA,
        attrCols = Seq("grp"))
      val all = vecs(0, 200)
      assert(probeIds(centsA, filtered = false)
        == freshIds(all, centsA, filtered = false))
      // 2. right-to-erasure of a slice
      IncrementalAnn.deleteFromIndex(
        vecs(0, 200).filter(col("id") % 9 === 0), table, 4, centsA)
      val afterDelete = all.filter(col("id") % 9 =!= 0)
      assert(probeIds(centsA, filtered = false)
        == freshIds(afterDelete, centsA, filtered = false))
      // 3. codebook refresh (attrs must ride along)
      IncrementalAnn.reassignIndex(spark, table, centsB)
      assert(probeIds(centsB, filtered = true)
        == freshIds(afterDelete, centsB, filtered = true))
      // 4. delete AFTER the refresh: erasure must work under the NEW
      // keys (the deleted vectors re-assign against centsB)
      IncrementalAnn.deleteFromIndex(
        afterDelete.filter(col("id") % 7 === 1), table, 4, centsB)
      val afterDelete2 = afterDelete.filter(col("id") % 7 =!= 1)
      assert(probeIds(centsB, filtered = false)
        == freshIds(afterDelete2, centsB, filtered = false))
      // 5. another append re-fragments the buckets (the refresh and
      // delete rewrites had left one file per bucket — compaction
      // right after them is correctly a no-op), then compaction
      // restores the layout without changing a verdict
      IncrementalAnn.appendToIndex(vecs(200, 240), table, 4, centsB,
        attrCols = Seq("grp"))
      val finalCorpus = afterDelete2.unionByName(vecs(200, 240))
      val before = probeIds(centsB, filtered = true)
      assert(before == freshIds(finalCorpus, centsB, filtered = true))
      assert(IncrementalAnn.compactIndex(spark, table,
        maxFilesPerBucket = 1) > 0)
      assert(probeIds(centsB, filtered = true) == before)
      // ...and the final index really is row-equivalent to the fresh
      // build of the surviving corpus
      assert(graft.sources.Bucketed.load(spark, table).count()
        == finalCorpus.count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("PQ code+vn pair: build -> append -> delete -> refresh -> crash window -> compact keeps serving exact") {
    val tC = "graft_lifecycle_pq_codes"
    val tV = "graft_lifecycle_pq_vn"
    // dim 16 => 8 subspaces x 2 dims
    val booksA = Pinned.pqBooks(m = 8, ksub = 16, subDim = 2)
    val booksB = Pinned.pqBooks(m = 8, ksub = 16, subDim = 2, salt = "r-")
    def plantOrphans(table: String): Unit = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      val dir = new java.io.File(
        new org.apache.hadoop.fs.Path(meta.location).toUri)
      dir.listFiles().filter(f => f.isFile && f.getName.startsWith("part-"))
        .foreach { f =>
          java.nio.file.Files.copy(f.toPath, new java.io.File(f.getParentFile,
            "part-9" + f.getName.stripPrefix("part-")).toPath)
        }
      spark.catalog.refreshTable(table)
    }
    try {
      val q = vecs(500, 506).drop("grp")
      def servedIds(cents: Array[Array[Double]],
                    books: Pq.Codebooks): Set[(Long, Long, Long, Int)] =
        IncrementalPq.probeRerank(spark, q, tC, tV, cents, books, k = 5,
            nProbe = 8, rerankFactor = 4)
          .select("query_id", "neighbor_id", "cos_e6", "rank")
          .as[(Long, Long, Long, Int)].collect().toSet
      def freshIds(corpus: org.apache.spark.sql.DataFrame,
                   cents: Array[Array[Double]],
                   books: Pq.Codebooks): Set[(Long, Long, Long, Int)] = {
        val (c2, v2) = (s"${tC}_ref", s"${tV}_ref")
        try {
          IncrementalPq.buildIndex(corpus, c2, 4, cents, books)
          IncrementalAnn.buildIndex(corpus, v2, 4, cents)
          IncrementalPq.probeRerank(spark, q, c2, v2, cents, books, k = 5,
              nProbe = 8, rerankFactor = 4)
            .select("query_id", "neighbor_id", "cos_e6", "rank")
            .as[(Long, Long, Long, Int)].collect().toSet
        } finally {
          spark.sql(s"DROP TABLE IF EXISTS $c2")
          spark.sql(s"DROP TABLE IF EXISTS $v2")
        }
      }
      // 1. build + append on BOTH halves of the serving pair
      IncrementalPq.buildIndex(vecs(0, 100), tC, 4, centsA, booksA)
      IncrementalAnn.buildIndex(vecs(0, 100), tV, 4, centsA)
      IncrementalPq.appendToIndex(vecs(100, 160), tC, 4, centsA, booksA)
      IncrementalAnn.appendToIndex(vecs(100, 160), tV, 4, centsA)
      val all = vecs(0, 160)
      assert(servedIds(centsA, booksA) == freshIds(all, centsA, booksA))
      // 2. erasure from both
      IncrementalPq.deleteFromIndex(all.filter(col("id") % 9 === 0),
        tC, 4, centsA, booksA)
      IncrementalAnn.deleteFromIndex(all.filter(col("id") % 9 === 0),
        tV, 4, centsA)
      val afterDelete = all.filter(col("id") % 9 =!= 0)
      assert(servedIds(centsA, booksA)
        == freshIds(afterDelete, centsA, booksA))
      // 3. codebook refresh across the pair: the vn index re-keys in
      // place, the code index re-encodes FROM it — no corpus re-read
      IncrementalAnn.reassignIndex(spark, tV, centsB)
      IncrementalPq.refreshFromVnIndex(spark, tC, tV, centsB, booksB)
      val underB = freshIds(afterDelete, centsB, booksB)
      assert(servedIds(centsB, booksB) == underB)
      // 4. crash window: an interrupted maintenance swap dies WITH its
      // process, leaving staged (uncommitted) files beside the live
      // generation of the CODE index — the family where a visible
      // duplicate would change ADC SCORES, not just occupy a slot. On
      // restart (cold verified-state), the first load resolves through
      // the manifest and reconciles the orphans, so serving stays
      // exact...
      plantOrphans(tC)
      graft.sources.Bucketed.forgetVerified()
      assert(servedIds(centsB, booksB) == underB,
        "uncommitted staging files must not change served scores")
      // ...and compaction (any later maintenance) reconciles them
      IncrementalPq.compactIndex(spark, tC, maxFilesPerBucket = 1)
      IncrementalAnn.compactIndex(spark, tV, maxFilesPerBucket = 1)
      assert(servedIds(centsB, booksB) == underB)
      assert(graft.sources.Bucketed.load(spark, tC).count()
        == afterDelete.count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tC")
      spark.sql(s"DROP TABLE IF EXISTS $tV")
    }
  }
}
