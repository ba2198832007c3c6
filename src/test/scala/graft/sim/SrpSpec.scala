package graft.sim

import graft.functions.Hashing

class SrpSpec extends graft.SparkSuite {

  test("sign matrix is the square-mixed polyhash threshold") {
    for (j <- 0 until 4; d <- 0 until 8) {
      val expected =
        if (Hashing.squareMix(Hashing.polyHash(s"$j:$d")) * 2 < Hashing.P) 1L
        else -1L
      assert(Srp.sign(j, d) == expected)
    }
  }

  test("sign matrix rows decorrelate to the random baseline") {
    // the regression that motivated squareMix: parity or affine-mixed
    // signs of "j:d" strings are rank-degenerate (row |corr| ~ 1.0);
    // true-random +-1 rows of length 64 have mean |corr| ~ 0.10
    val m = Array.tabulate(16, 64)((j, d) => Srp.sign(j, d).toDouble)
    val corrs = for (a <- 0 until 16; b <- a + 1 until 16) yield
      math.abs((0 until 64).map(d => m(a)(d) * m(b)(d)).sum / 64.0)
    assert(corrs.max <= 0.5, s"max row |corr| ${corrs.max} — structured signs")
    assert(corrs.sum / corrs.size <= 0.2,
      s"mean row |corr| ${corrs.sum / corrs.size} — structured signs")
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

  test("project: dense components replicate the integer dots; sketch bits agree") {
    import spark.implicits._
    val vecs: Seq[(Long, Array[Float])] = Seq(
      1L -> Array(0.5f, -0.25f, 0.125f),
      2L -> Array(-1.0f, 2.0f, -3.0f))
    val proj = Srp.project(vecs.toDF("vec_id", "embedding"), outDims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    vecs.foreach { case (id, v) =>
      val xi = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      for (j <- 0 until 8) {
        val expected = xi.indices.map(d => xi(d) * Srp.sign(j, d)).sum
        assert(proj((id, j.toLong)) == expected)
      }
    }
    // consistency: sketch bit j == sign of projected component j
    val sigs = Srp.sketch(vecs.toDF("vec_id", "embedding"), planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, _) =>
      for (j <- 0 until 8)
        assert((((sigs(id) >> j) & 1L) == 1L) == (proj((id, j.toLong)) >= 0L))
    }
  }

  test("project separates near pairs from far pairs (JL property)") {
    import spark.implicits._
    // i.i.d. random points in 64-d are all nearly equidistant (distance
    // concentration), so a correlation check would only measure JL
    // noise. The property that matters for a near-dup pre-filter is
    // SEPARATION: planted near-duplicates must stay much closer in the
    // projected space than unrelated pairs.
    val rnd = new scala.util.Random(7)
    def randVec() = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val bases = (0 until 10).map(i => i.toLong -> randVec())
    val nearDups = bases.map { case (id, v) =>
      (id + 100L) -> v.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
    }
    val vecs = bases ++ nearDups
    val proj = Srp.project(vecs.toDF("vec_id", "embedding"), outDims = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getLong(2).toDouble / 1e6).toSeq
      }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val nearMax = bases.map { case (id, _) => d2(proj(id), proj(id + 100L)) }.max
    val farMin = (for (a <- 0L until 10L; b <- a + 1 until 10L)
      yield d2(proj(a), proj(b))).min
    assert(nearMax * 10 < farMin,
      s"near-dup pairs ($nearMax) should project far closer than unrelated pairs ($farMin)")
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
