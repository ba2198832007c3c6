package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Exact bucket-selection quantiles (q126 companion): must equal the
  * full-sort order statistic exactly, on any partitioning. */
class QuantilesSpec extends SparkSuite {
  import spark.implicits._

  test("matches the sorted order statistic, duplicates and negatives included") {
    val data = Seq(5L, -3L, 5L, 5L, 0L, 100L, -3L, 7L, 2L, 2L)
    val df = data.toDF("v").repartition(4)
    val sorted = data.sorted
    def expected(q: Double): Long =
      sorted(math.max(1, math.ceil(q * data.size).toInt) - 1)
    val got = Quantiles.quantiles(df, "v", Seq(0.1, 0.5, 0.9, 1.0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1000L -> expected(0.1), 5000L -> expected(0.5),
      9000L -> expected(0.9), 10000L -> expected(1.0)))
  }

  test("wide value range narrows to the exact answer (multi-round path)") {
    // values spread over ~2^40 so one 2^16-bucket round cannot finish
    val data = (1 to 999).map(i => i.toLong * (1L << 30))
    val df = data.toDF("v").repartition(7)
    val got = Quantiles.quantiles(df, "v", Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5000L) == data.sorted.apply(math.ceil(0.5 * 999).toInt - 1))
  }

  test("full Long-spanning range is exact (unsigned width math)") {
    val data = Seq(Long.MinValue, -7L, 0L, 42L, Long.MaxValue)
    val got = Quantiles.quantiles(data.toDF("v"), "v",
        Seq(0.2, 0.4, 0.6, 0.8, 1.0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2000L -> Long.MinValue, 4000L -> -7L, 6000L -> 0L,
      8000L -> 42L, 10000L -> Long.MaxValue))
  }

  test("nulls are excluded from values AND the rank denominator") {
    val df = Seq(Some(10L), None, Some(30L), None, Some(20L))
      .toDF("v")
    val got = Quantiles.quantiles(df, "v", Seq(0.5, 1.0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n = 3 non-null: median is 20, max is 30 — if nulls counted, the
    // rank for q=0.5 would be ceil(2.5)=3 and return 30
    assert(got == Map(5000L -> 20L, 10000L -> 30L))
  }

  test("tiny bucket counts still converge exactly (or fail loudly)") {
    val data = (1 to 500).map(i => i.toLong * (1L << 40))
    val got = Quantiles.selectRanks(data.toDF("v"), "v", Seq(250L),
      buckets = 2)
    assert(got(250L) == 250L * (1L << 40))
  }

  test("ranks converging in different rounds keep correct histogram slots") {
    // span 65537 over 65536 buckets → width 2: q=1.0's rank lands in
    // the clipped final bucket and converges in round 1, while q=0.5
    // stays active into round 2. The round-2 histogram has ONE active
    // slot — addressing it by the rank's position in the full state
    // map (its index is 1) read past the array. Regression for the
    // round-6 advisory finding.
    val data = (0 to 65536).map(_.toLong)
    val df = data.toDF("v").repartition(5)
    val got = Quantiles.quantiles(df, "v", Seq(1.0, 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10000L -> 65536L, 5000L -> 32768L))
    // same shape with MORE ranks straggling at different rounds
    val got2 = Quantiles.quantiles(df, "v", Seq(1.0, 0.25, 0.5, 0.75))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(10000L -> 65536L, 2500L -> 16384L,
      5000L -> 32768L, 7500L -> 49152L))
  }

  test("groupedQuantiles matches per-group order statistics on skewed groups") {
    // heavily skewed: one 50k-row group, one 7-row group, one 1-row
    // group, plus a group whose values force multi-round narrowing
    val big = (1 to 50000).map(i =>
      ("big", ((i * 2654435761L) % 100003L) - 50L))
    val small = (1 to 7).map(i => ("small", i * 10L))
    val one = Seq(("one", 42L))
    val wide = (1 to 999).map(i => ("wide", i.toLong * (1L << 30)))
    val data = big ++ small ++ one ++ wide
    val qs = Seq(0.25, 0.5, 0.99, 1.0)
    def expected(rows: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
      val sorted = rows.map(_._2).sorted
      qs.map(q => (rows.head._1, math.round(q * 10000.0),
        sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)))
    }
    val exp = Seq(big, small, one, wide).flatMap(expected).toSet
    for (parts <- Seq(3, 17)) {
      val got = Quantiles.groupedQuantiles(
          data.toDF("g", "v").repartition(parts), Seq("g"), "v", qs)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == exp, s"parts=$parts")
    }
    // nulls excluded per group; maxGroups guard fails loudly
    val withNulls = Seq(("a", Some(10L)), ("a", None), ("a", Some(30L)),
      ("b", None), ("b", Some(5L))).toDF("g", "v")
    val gn = Quantiles.groupedQuantiles(withNulls, Seq("g"), "v", Seq(0.5))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(gn == Set(("a", 10L), ("b", 5L)))
    // a NULL group VALUE is its own group, not aliased away (concat_ws
    // skips null args — the sentinel guards against that)
    val nullGroup = Seq((Option("a"), 1L), (Option("a"), 3L),
      (Option.empty[String], 100L)).toDF("g", "v")
    val ng = Quantiles.groupedQuantiles(nullGroup, Seq("g"), "v", Seq(1.0))
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toSet
    assert(ng == Set((Some("a"), 3L), (None, 100L)))
    intercept[IllegalArgumentException] {
      Quantiles.groupedQuantiles(data.toDF("g", "v"), Seq("g"), "v",
        Seq(0.5), maxGroups = 2)
    }
  }

  test("group keys are injective: NUL/escape-bearing and multi-column groups never alias") {
    // the NUL-joined key's classic aliasing traps: a group value that
    // CONTAINS the separator, values containing the escape char, and
    // multi-column splits where ("a\u0000b", "c") could collide with
    // ("a", "b\u0000c") — each must keep its own quantile
    val tricky = Seq(
      (("a\u0000b", "c"), 1L), (("a\u0000b", "c"), 3L),
      (("a", "b\u0000c"), 100L),
      (("a\u0001e", "z"), 7L), (("a\u0001", "ez"), 9L),
      (("n", null.asInstanceOf[String]), 55L),
      (("vn", "x"), 66L))
    val df = tricky.map { case ((g1, g2), v) => (g1, g2, v) }
      .toDF("g1", "g2", "v")
    val got = Quantiles.groupedQuantiles(df, Seq("g1", "g2"), "v", Seq(1.0))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toSet
    val exp = tricky.groupBy(_._1).map { case (g, rows) =>
      (g, rows.map(_._2).max) }.toSet
    assert(got == exp)
  }

  test("wide group columns ride the final join, not the driver collect") {
    // a fat per-group payload column (64 kB per group value) — the
    // narrow (key, n, lo, hi) driver contract means this runs without
    // the driver ever holding groups × 64 kB; output carries the fat
    // value back intact via the key join
    def wideOf(g: Int): String = ("g" + g) * 32768
    val rows = for (g <- 0 until 6; i <- 1 to 20)
      yield (wideOf(g), i.toLong * (g + 1))
    val got = Quantiles.groupedQuantiles(rows.toDF("wide", "v"),
        Seq("wide"), "v", Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val exp = (for (g <- 0 until 6) yield {
      val vs = (1 to 20).map(i => i.toLong * (g + 1)).sorted
      Seq((wideOf(g), 5000L, vs(math.ceil(0.5 * 20).toInt - 1)),
        (wideOf(g), 10000L, vs.last))
    }).flatten.toSet
    assert(got == exp)
    // every wide value survived the join-back
    assert(got.map(_._1).forall(_.length == 65536))
  }

  test("deterministic across partitionings; rejects empty input") {
    val data = (1 to 5000).map(i => ((i * 2654435761L) % 997L) - 100L)
    val a = Quantiles.quantiles(data.toDF("v").repartition(3), "v",
      Seq(0.25, 0.75)).collect().map(_.toSeq).toSet
    val b = Quantiles.quantiles(data.toDF("v").repartition(17), "v",
      Seq(0.25, 0.75)).collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Quantiles.quantiles(Seq.empty[Long].toDF("v"), "v", Seq(0.5))
    }
  }
}
