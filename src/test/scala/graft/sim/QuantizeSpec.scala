package graft.sim

import org.apache.spark.sql.functions._

class QuantizeSpec extends graft.SparkSuite {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("int8 codes are bounded, zero-safe, and scale round-trips magnitude") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5, -1.0, 0.25)),
      (2L, Array(0.0, 0.0, 0.0)), // zero vector -> zero codes, zero scale
      (3L, Array(2.0)))
      .toDF("id", "vec")
    val q = Quantize.int8(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Int](2))).toMap
    assert(q(1L)._2 == Seq(64, -127, 32)) // 0.5/1*127+0.5 floor = 64
    assert(q(2L) == ((0L, Seq(0, 0, 0))))
    assert(q(3L)._2 == Seq(127))
    // dequant: codes * scale ~ original magnitude (within quantization step)
    val scale3 = q(3L)._1 / 1e9
    assert(math.abs(127 * scale3 - 2.0) < 2.0 / 127)
    // all codes in int8 range
    val all = Quantize.int8(emb).select(array_min(col("codes")),
      array_max(col("codes"))).collect()
    assert(all.forall(r => r.getInt(0) >= -127 && r.getInt(1) <= 127))
  }

  test("int8-scored ANN recall ≥ 0.9 vs exact on real embeddings (gate for q50)") {
    val queries = emb.filter(col("id") < 20)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topSet(Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id"))
    val quant = topSet(Quantize.bruteForceTopKInt8(queries, emb, k = 5)
      .select("query_id", "neighbor_id"))
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }
}
