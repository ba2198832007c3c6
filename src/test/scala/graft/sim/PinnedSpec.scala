package graft.sim

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pinned-codebook serving-math gates (q113/q114/q115 companions): the
  * pinned generators must emit exact binary fractions (so Spark and the
  * DuckDB oracle replay identical IEEE ops), and the pinned ADC path
  * must agree with an independently computed per-pair score. */
class PinnedSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("pinned components are exact quarter steps, deterministic") {
    val vals = (0 until 16).flatMap(c => (0 until 64).map(d =>
      Pinned.value(s"$c:$d")))
    assert(vals.forall(v => v * 4 == math.rint(v * 4) && v.abs <= 0.5))
    assert(Pinned.ivfCentroids()(3)(7) == Pinned.value("3:7"))
    // the generator must actually spread across all five steps
    assert(vals.distinct.sorted == Seq(-0.5, -0.25, 0.0, 0.25, 0.5))
  }

  test("pinnedAdcTopK matches an independent LUT-sum computation") {
    val books = Pinned.pqBooks()
    val q = emb.filter(col("id") < 3)
    val got = Pq.pinnedAdcTopK(q, emb, books, k = 5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.nonEmpty && got.keys.map(_._1).toSet == Set(0L, 1L, 2L))

    // independent replay: normalize, encode, LUT-quantize, integer-sum
    def normalize(v: Array[Double]): Array[Double] = {
      val ss = v.foldLeft(0.0)((a, x) => a + x * x)
      val inv = if (ss == 0) 0.0 else 1.0 / math.sqrt(ss)
      v.map(_ * inv)
    }
    val all = emb.select(col("id").cast("long"),
        col("vec").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap.map {
        case (id, v) => (id, normalize(v))
      }
    def codesOf(v: Array[Double]): Array[Int] = Array.tabulate(8) { s =>
      (0 until 16).minBy { c =>
        (0 until 8).foldLeft(0.0) { (acc, j) =>
          val diff = v(s * 8 + j) - books(s)(c)(j); acc + diff * diff
        }
      }
    }
    got.foreach { case ((qid, nid), adc) =>
      val qv = all(qid)
      val cs = codesOf(all(nid))
      val expected = (0 until 8).map { s =>
        val dot = (0 until 8).foldLeft(0.0)((a, j) =>
          a + qv(s * 8 + j) * books(s)(cs(s))(j))
        math.floor(dot * 1e6).toLong
      }.sum
      assert(adc == expected, s"($qid,$nid): $adc != $expected")
    }
  }

  test("pinned IVF assignment is the argmax centroid with low-index ties") {
    val cents = Pinned.ivfCentroids()
    val assigned = Ivf.assignments(emb, cents).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(assigned.size == 500)
    assert(assigned.values.forall(c => c >= 0 && c < 16))
    // at least two distinct centroids get traffic on real data
    assert(assigned.values.toSet.size > 1)
  }
}
