package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** PQ codebook training, encoding, and ADC serving gates (q82 is
  * registered rows-only — float k-means has no SQL oracle — so these
  * specs are its correctness contract). */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("codebooks have m subspaces x ksub centroids covering the dim") {
    val books = Pq.trainCodebooks(emb, m = 8, ksub = 16, iters = 2)
    assert(books.length == 8)
    assert(books.forall(_.length == 16))
    assert(books.map(_.head.length).sum == 64) // embeddings are 64-dim
  }

  test("encode emits one in-range code per subspace") {
    val books = Pq.trainCodebooks(emb, m = 8, ksub = 16, iters = 2)
    val codes = Pq.encode(emb, books).collect()
    assert(codes.length == 500)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("ADC+rerank recall ≥ 0.9 on real embeddings (driver gate for q82)") {
    val q = emb.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.adcTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("IVF+PQ recall ≥ 0.85 on real embeddings (probe-restricted ADC)") {
    val q = emb.filter(col("id") < 20)
    val exact = Similarity.bruteForceTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.ivfPqTopK(q, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall=$recall")
  }

  test("serving from the persisted codes table equals the float-scan path") {
    val q = emb.filter(col("id") < 10)
    val books = Pq.codebooksFor(emb)
    val codes = Pq.encode(emb, books)
    val fromCodes = Pq.adcTopKFromCodes(q, codes, books, emb, k = 5)
      .collect().map(_.toSeq).toSet
    val fromFloats = Pq.adcTopK(q, emb, k = 5).collect().map(_.toSeq).toSet
    assert(fromCodes == fromFloats)
  }

  test("rerank scores are the exact cosine (same contract as q27)") {
    val q = emb.filter(col("id") < 3)
    val pq = Pq.adcTopK(q, emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = Similarity.bruteForceTopK(q, emb, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every PQ-returned pair that the exact top-50 also contains must
    // carry an identical quantized cosine (normalized-vector DotE6 vs
    // raw-vector cosine may differ in the last ulp -> allow 1)
    pq.foreach { case (pair, s) =>
      exact.get(pair).foreach(e => assert(math.abs(e - s) <= 1,
        s"$pair pq=$s exact=$e"))
    }
  }
}
