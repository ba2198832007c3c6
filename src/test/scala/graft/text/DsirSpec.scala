package graft.text

import org.apache.spark.sql.functions._
import graft.functions.Hashing

class DsirSpec extends graft.SparkSuite {

  // target speaks "alpha beta", raw background speaks "omega sigma" — a
  // raw doc full of target-ish words must outscore a background doc.
  // The four words land in four DISTINCT 64-buckets (30/48/33/37 —
  // asserted below; e.g. "aa"/"yy" would collide because base 31 is
  // congruent mod 64)
  private def targetDF = {
    import spark.implicits._
    Seq((100L, "alpha beta alpha beta alpha beta"),
      (101L, "alpha beta alpha beta")).toDF("doc_id", "text")
  }
  private def rawDF = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta alpha beta"),      // looks like target
      (1L, "omega sigma omega sigma"),    // background
      (2L, "omega sigma omega sigma omega sigma omega sigma"))
      .toDF("doc_id", "text")
  }

  test("ratio table covers the full bucket domain, clamped to [1e3, 1e9]") {
    val rt = Dsir.ratioTable(rawDF, targetDF, buckets = 64).collect()
    assert(rt.length == 64)
    val buckets = rt.map(_.getLong(0)).toSet
    assert(buckets == (0L until 64L).toSet)
    rt.foreach { r =>
      val v = r.getLong(1)
      assert(v >= 1000L && v <= 1000000000L, s"ratio $v out of clamp range")
    }
  }

  test("importance weights replicate the integer formula by hand") {
    val B = 64
    // independent reimplementation of the quantized arithmetic
    def words(t: String): Seq[String] =
      t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1).toSeq
    def bucket(w: String): Long = Math.floorMod(Hashing.polyHash(w), B.toLong)
    val tCounts = targetDF.collect().map(_.getString(1)).flatMap(words)
      .groupBy(bucket).map { case (b, ws) => b -> ws.size.toLong }
    val rCounts = rawDF.collect().map(_.getString(1)).flatMap(words)
      .groupBy(bucket).map { case (b, ws) => b -> ws.size.toLong }
    val tt = tCounts.values.sum; val tr = rCounts.values.sum
    def ratio(b: Long): Long = {
      val pT = (tCounts.getOrElse(b, 0L) + 1) * 1000000000L / (tt + B)
      val pR = (rCounts.getOrElse(b, 0L) + 1) * 1000000000L / (tr + B)
      math.min(math.max(pT * 1000000L / math.max(pR, 1L), 1000L), 1000000000L)
    }
    val expected = rawDF.collect().map { r =>
      val ws = words(r.getString(1))
      (r.getLong(0), ws.size.toLong, ws.map(w => ratio(bucket(w))).sum)
    }.sortBy(_._1).toSeq

    val got = Dsir.importanceWeights(rawDF, targetDF, buckets = B)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("target-like raw docs outscore background docs per word") {
    val bucketsOf = Seq("alpha", "beta", "omega", "sigma")
      .map(w => Math.floorMod(Hashing.polyHash(w), 64L))
    assert(bucketsOf.distinct.size == 4, s"fixture words collide: $bucketsOf")
    val scores = Dsir.importanceWeights(rawDF, targetDF, buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(2).toDouble / r.getLong(1)))
      .toMap
    assert(scores(0L) > scores(1L),
      s"target-like doc 0 (${scores(0L)}) should outscore background doc 1 (${scores(1L)})")
    // per-word normalization: doc 2 is doc 1's words doubled — same mean
    assert(math.abs(scores(1L) - scores(2L)) < 1e-9)
  }
}
