package graft.sim

import graft.functions.Hashing

class SrpSpec extends graft.SparkSuite {

  test("sign matrix is polyhash parity") {
    for (j <- 0 until 4; d <- 0 until 8) {
      val expected = if (Hashing.polyHash(s"$j:$d") % 2 == 0L) 1L else -1L
      assert(Srp.sign(j, d) == expected)
    }
  }

  test("sketch replicates the quantized dot-product formula by hand") {
    import spark.implicits._
    val vecs: Seq[(Long, Array[Float])] = Seq(
      1L -> Array(0.5f, -0.25f, 0.125f),
      2L -> Array(-1.0f, 2.0f, -3.0f),
      3L -> Array(0.0f, 0.0f, 0.0f)) // zero vector: every dot = 0 -> all bits set
    val planes = 8
    val expected = vecs.map { case (id, v) =>
      val xi = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      var sig = 0L
      for (j <- 0 until planes) {
        val dot = xi.indices.map(d => xi(d) * Srp.sign(j, d)).sum
        if (dot >= 0L) sig |= (1L << j)
      }
      (id, sig)
    }
    val got = Srp.sketch(vecs.toDF("vec_id", "embedding"), planes = planes)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(expected.find(_._1 == 3L).get._2 == (1L << planes) - 1)
  }

  test("identical vectors share a signature; scaling preserves it") {
    import spark.implicits._
    val base = Array(0.3f, -0.7f, 0.2f, 0.9f)
    val vecs = Seq(
      1L -> base,
      2L -> base.clone(),
      3L -> base.map(_ * 2.0f)) // same direction, same signs
    val sigs = Srp.sketch(vecs.toDF("vec_id", "embedding"), planes = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) == sigs(3L))
  }

  test("opposite vectors flip every nonzero-dot bit") {
    import spark.implicits._
    val v = Array(0.5f, -0.25f, 0.75f, 0.1f)
    // negation flips dot signs; floor-quantization of -x gives -xi when
    // xi is exact (these binary fractions are), so bits flip except dot==0
    val sigs = Srp.sketch(
        Seq(1L -> v, 2L -> v.map(-_)).toDF("vec_id", "embedding"),
        planes = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xi = v.map(x => math.floor(x.toDouble * 1e6).toLong)
    val zeroDots = (0 until 16).count { j =>
      xi.indices.map(d => xi(d) * Srp.sign(j, d)).sum == 0L
    }
    val differing = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    assert(differing == 16 - zeroDots)
  }

  test("bucket census counts signatures") {
    import spark.implicits._
    val base = Array(1.0f, 2.0f)
    val df = Seq(1L -> base, 2L -> base.clone(), 3L -> base.map(-_))
      .toDF("vec_id", "embedding")
    val census = Srp.bucketSizes(Srp.sketch(df, planes = 8))
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(census == Seq(1L, 2L))
  }

  test("sketch plan is map-only: no key shuffle (widen round-robin ok)") {
    import spark.implicits._
    val df = Seq(1L -> Array(1.0f, 2.0f)).toDF("vec_id", "embedding")
    val plan = Srp.sketch(df, planes = 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning")
      && !plan.contains("Exchange rangepartitioning"),
      s"expected no key shuffle:\n$plan")
  }
}
