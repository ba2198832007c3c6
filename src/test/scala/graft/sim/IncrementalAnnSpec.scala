package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Index-and-probe incremental ANN: probe must equal a from-scratch
  * reference computation (assignment, probe lists, exact re-rank), the
  * probe join must be Exchange-free on the index side with the probed
  * centroids bucket-pruning the scan, and appended vectors must be
  * visible to later probes without a rebuild. */
class IncrementalAnnSpec extends SparkSuite {
  import spark.implicits._

  private val table = "graft_inc_ann_idx"
  private val buckets = 4
  private val dim = 8
  private val cents = Pinned.ivfCentroids(4, dim)

  private def vec(i: Int): Array[Double] =
    Array.tabulate(dim)(d => ((i * 31 + d * 7) % 11 - 5) * 0.25)

  private def corpus = (0 until 30)
    .map(i => (i.toLong, vec(i))).toDF("id", "vec")
  private def batch = (100 until 105)
    .map(i => (i.toLong, vec(i))).toDF("id", "vec")

  // from-scratch reference: same arithmetic, no Spark
  private def norm(v: Array[Double]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
    v.map(_ * inv)
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
  private def expected(k: Int, nProbe: Int): Set[(Long, Long, Long, Int)] = {
    val corpusN = (0 until 30).map(i => (i.toLong, norm(vec(i))))
    val lists = corpusN.map { case (id, vn) =>
      (id, vn, Ivf.nearestCentroid(vn, cents)) }
    (100 until 105).flatMap { q =>
      val qn = norm(vec(q))
      val probed = cents.indices
        .map(c => (c, dot(qn, cents(c))))
        .sortBy { case (c, d) => (-d, c) }
        .take(nProbe).map(_._1).toSet
      lists.filter { case (_, _, c) => probed(c) }
        .map { case (id, vn, _) =>
          (id, math.floor(dot(qn, vn) * 1000000.0).toLong) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((id, s), r) => (q.toLong, id, s, r + 1) }
    }.toSet
  }

  test("probe equals the from-scratch reference ranking") {
    try {
      IncrementalAnn.buildIndex(corpus, table, buckets, cents)
      val got = IncrementalAnn.probe(spark, batch, table, cents,
          k = 3, nProbe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cos_e6"),
          col("rank"))
        .as[(Long, Long, Long, Int)].collect().toSet
      val exp = expected(k = 3, nProbe = 2)
      assert(got == exp && got.nonEmpty, s"got=$got expected=$exp")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("probe join is Exchange-free on the index side and bucket-prunes") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      IncrementalAnn.buildIndex(corpus, table, buckets, cents)
      // one query probing 2 of 4 lists: exactly two Exchanges total
      // (the batch's probe rows + the top-k window) — an index-side
      // shuffle would make it three
      val one = IncrementalAnn.probe(spark,
        batch.filter(col("id") === 100L), table, cents, k = 3, nProbe = 2)
      val plan = one.queryExecution.executedPlan.toString
      val nExchanges = "(?<!Reused)Exchange".r.findAllIn(plan).size
      assert(nExchanges == 2,
        s"expected 2 Exchanges (probes + window), got $nExchanges:\n$plan")
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined, s"expected bucket pruning:\n$plan")
      assert(sel.get.group(1).toInt <= 2 && sel.get.group(2).toInt == buckets,
        s"expected at most 2 of $buckets buckets: ${sel.get.matched}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("appended vectors are visible to later probes without a rebuild") {
    try {
      IncrementalAnn.buildIndex(corpus, table, buckets, cents)
      // vec(i) has only 11 distinct value classes (mod-11 arithmetic),
      // all present in the corpus — append a direction the corpus does
      // NOT contain so the probe's top hit can only come from the append
      val novel = Array.tabulate(dim)(d =>
        (d + 1) * 0.25 * (if (d % 2 == 0) 1 else -1))
      IncrementalAnn.appendToIndex(
        Seq((100L, novel)).toDF("id", "vec"), table, buckets, cents)
      // 200 carries the exact appended vector — it must surface as the
      // top neighbour with cos_e6 ~ 1e6
      val probe2 = Seq((200L, novel)).toDF("id", "vec")
      val top = IncrementalAnn.probe(spark, probe2, table, cents,
          k = 1, nProbe = 1)
        .select("neighbor_id", "cos_e6").as[(Long, Long)].collect()
      assert(top.length == 1 && top.head._1 == 100L &&
        top.head._2 >= 999999L, s"got ${top.toSeq}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
