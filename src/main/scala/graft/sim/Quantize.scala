package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding vectors — the vector-store
  * compression path for ANN at scale: a float32/float64 corpus rewritten
  * as one int8 code per dimension plus one per-vector scale is 4-8×
  * smaller, which at 100 TB is the difference between a vector store
  * that fits executor storage and one that doesn't. Candidate scoring
  * runs on the codes (integer dot products), with exact re-rank on the
  * full-precision vectors only for the shortlist.
  *
  * Determinism: codes are round-half-up of v/maxabs*127 (floor(x+0.5) —
  * identical IEEE arithmetic in any engine); maxabs == 0 yields all-zero
  * codes and scale 0. Quantization is MAP-ONLY (no shuffle).
  */
object Quantize {

  /** (id, scale_e9, codes: array<int8-valued int>) per input vector.
    * scale_e9 = floor(maxabs/127 × 1e9) — the dequant multiplier,
    * quantized itself so downstream arithmetic is integer-exact. */
  def int8(emb: DataFrame, idCol: String = "id",
           vecCol: String = "vec"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.sources.Tables.widen(emb)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.map { case (id, v) =>
        var maxabs = 0.0
        var i = 0
        while (i < v.length) {
          val a = math.abs(v(i)); if (a > maxabs) maxabs = a; i += 1
        }
        val codes = new Array[Int](v.length)
        if (maxabs > 0) {
          i = 0
          while (i < v.length) {
            codes(i) = math.floor(v(i) / maxabs * 127.0 + 0.5).toInt
            i += 1
          }
        }
        val scaleE9 = math.floor(maxabs / 127.0 * 1e9).toLong
        (id, scaleE9, codes)
      })
      .toDF(idCol, "scale_e9", "codes")
  }

  /** Top-k cosine neighbours scored entirely on int8 codes: the
    * integer dot product of codes is proportional to the cosine after
    * per-vector normalization (code-norm divides out the scales), so
    * ranking quality depends only on quantization error — recall vs the
    * exact ranking is scalatested. Same broadcast shape as
    * [[Similarity.bruteForceTopK]]; output (query_id, neighbor_id,
    * qcos_e6, rank). */
  def bruteForceTopKInt8(queries: DataFrame, corpus: DataFrame,
                         k: Int): DataFrame = {
    val q = broadcast(int8(queries).select(col("id").as("query_id"),
      col("codes").as("qc")))
    val c = int8(corpus).select(col("id").as("neighbor_id"),
      col("codes").as("cc"))
    val qcosE6 = udf { (a: Seq[Int], b: Seq[Int]) =>
      var dot = 0L
      var na = 0L
      var nb = 0L
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) { dot += a(i).toLong * b(i); i += 1 }
      i = 0
      while (i < a.length) { na += a(i).toLong * a(i); i += 1 }
      i = 0
      while (i < b.length) { nb += b(i).toLong * b(i); i += 1 }
      if (na == 0 || nb == 0) 0L
      else math.floor(dot.toDouble
        / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)) * 1000000.0).toLong
    }
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qcosE6(col("qc"), col("cc")).as("qcos_e6"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcos_e6").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
