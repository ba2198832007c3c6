package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the skew profiler: exact counts, integer-exact shares,
  * deterministic tie-break at the top-N cut, and the only-topN-rows
  * plan shape (TakeOrdered, no global sort of all keys). */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("keySkew: counts, shares, tie-break, cut") {
    // key 1: 6 rows, key 2: 3 rows, keys 3 and 4: 1 row each (tie)
    val df = (Seq.fill(6)(1) ++ Seq.fill(3)(2) ++ Seq(3, 4)).toDF("k")
    val got = Profile.keySkew(df, Seq("k"), topN = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1, 6L, 6L * 1000000L / 11L),
      (2, 3L, 3L * 1000000L / 11L),
      (3, 1L, 1000000L / 11L)))  // tie with key 4 -> smaller key wins
  }

  test("keySkew: multi-column keys and empty input") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("x", "y")
    val got = Profile.keySkew(df, Seq("x", "y"), topN = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a", 2L), (1, "b", 1L)))
    assert(Profile.keySkew(df.filter(lit(false)), Seq("x")).count() == 0)
  }

  test("approxDistinct: within HLL error of exact, deterministic re-run") {
    val df = (1 to 5000).map(i => (i % 3, i % 700)).toDF("g", "v")
    val got = Profile.approxDistinct(df, Seq("g"), "v", rsd = 0.02)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      val (approx, n) = got(g)
      assert(math.abs(approx - d).toDouble / d < 0.1,
        s"group $g: approx $approx vs exact $d")
      assert(n > 0)
    }
    val again = Profile.approxDistinct(df.repartition(7), Seq("g"), "v",
        rsd = 0.02)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == got.map { case (k, (a, _)) => k -> a },
      "HLL must be deterministic across partitionings")
  }

  test("kmvDistinct: exact below k, within ~2/sqrt(k) above, deterministic") {
    // below k distinct values: the estimate IS the exact count
    val small = (1 to 100).map(i => (i % 2, i)).toDF("g", "v")
    val exactSmall = Profile.kmvDistinct(small, Seq("g"), "v", k = 256)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exactSmall == Map(0 -> 50L, 1 -> 50L))
    // above k: estimator error ~ 1/sqrt(k); allow 3 sigma
    val big = (1 to 60000).map(i => (i % 3, i % 7000)).toDF("g", "v")
    val est = Profile.kmvDistinct(big, Seq("g"), "v", k = 256)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = big.groupBy("g").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(est(g) - d).toDouble / d < 3.0 / math.sqrt(256.0),
        s"group $g: kmv ${est(g)} vs exact $d")
    }
    // deterministic across partitionings (pure hash arithmetic)
    val again = Profile.kmvDistinct(big.repartition(13), Seq("g"), "v",
        k = 256)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == est)
  }

  test("kmvDistinct: NULL group key estimates like any other group") {
    // regression: the kth join must be null-safe — a NULL group with
    // >= k distinct values used to miss its kth row and return the
    // meaningless post-prune count
    val df = (1 to 30000)
      .map(i => (if (i % 2 == 0) null else "a", i % 9000))
      .toDF("g", "v").repartition(11)
    val est = Profile.kmvDistinct(df, Seq("g"), "v", k = 64)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("d"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    exact.foreach { case (g, d) =>
      assert(math.abs(est(g) - d).toDouble / d < 3.0 / math.sqrt(64.0),
        s"group $g: kmv ${est(g)} vs exact $d")
    }
  }

  test("kmvDistinct: binary group keys stay correct (exact path)") {
    val df = (1 to 400)
      .map(i => (Array((i % 2).toByte), i % 50)).toDF("g", "v")
      .repartition(5)
    // parity of i fixes the parity of i % 50: 25 distinct values each
    val got = Profile.kmvDistinct(df, Seq("g"), "v", k = 256)
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    assert(got == Map(Seq(0.toByte) -> 25L, Seq(1.toByte) -> 25L))
  }

  test("kmvDistinct: empty input yields no rows") {
    val empty = Seq.empty[(Int, Int)].toDF("g", "v")
    assert(Profile.kmvDistinct(empty, Seq("g"), "v").count() == 0)
  }

  test("kmvDistinct plan: the k-th order statistic prunes via WindowGroupLimit") {
    val df = (1 to 20000).map(i => (i % 3, i % 5000)).toDF("g", "v")
    val p = Profile.kmvDistinct(df, Seq("g"), "v", k = 64)
      .queryExecution.executedPlan.toString
    // rn = k must plan as a group-limit (partial top-k per partition
    // before the exchange), not a full per-group sort surviving to one
    // task — the property that makes the estimator usable at corpus
    // cardinalities
    assert(p.contains("WindowGroupLimit"), s"no group limit:\n$p")
  }

  test("keySkew plan: TakeOrdered cut, no full sort exchange of all keys") {
    val df = (1 to 1000).map(_ % 50).toDF("k")
    val p = Profile.keySkew(df, Seq("k"), topN = 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrdered"), p)
  }
}
