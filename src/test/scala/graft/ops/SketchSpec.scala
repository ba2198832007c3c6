package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Misra-Gries sketch + two-pass heavy hitters: the ε-bound guarantees
  * on data where the sketch is NOT trivially exact (#distinct ≫ k),
  * which the q97 oracle-checked query cannot exercise (the corpus
  * vocabulary fits in its counters). */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  /** Zipf-ish stream: token t_i appears ~N/i times, i = 1..D. */
  private def zipf(dSize: Int, scale: Int) =
    (1 to dSize).flatMap(i => Seq.fill(scale / i)(f"t$i%04d"))

  test("summary under-estimates within n/(k+1) and keeps every true heavy hitter") {
    val data = zipf(400, 2000) // ~2000 + 1000 + 666 + ... ; D=400 distinct
    val n = data.size.toLong
    val k = 32
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val r = Sketch.misraGries(
      data.toDF("tok").repartition(7), "tok", k) // multi-partition merge path
    assert(r.n == n)
    assert(r.entries.size <= k)
    val bound = n / (k + 1)
    r.entries.foreach { e =>
      val t = truth(e.token)
      assert(e.estimate <= t, s"${e.token}: est ${e.estimate} > true $t")
      assert(t - e.estimate <= bound,
        s"${e.token}: under-count ${t - e.estimate} > bound $bound")
    }
    val kept = r.entries.map(_.token).toSet
    truth.collect { case (t, c) if c > bound => t }.foreach { t =>
      assert(kept(t), s"true heavy hitter $t (count ${truth(t)}) missing")
    }
  }

  test("heavyHitters equals the exact GROUP BY + HAVING result") {
    val data = zipf(300, 1500)
    val df = data.toDF("tok").repartition(5)
    val minCount = 60L
    val got = Sketch.heavyHitters(df, "tok", k = 256, minCount = minCount)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("heavyHitters refuses an unachievable minCount instead of silently dropping items") {
    val df = zipf(500, 500).toDF("tok")
    val ex = intercept[IllegalArgumentException] {
      Sketch.heavyHitters(df, "tok", k = 4, minCount = 10L)
    }
    assert(ex.getMessage.contains("error bound"))
  }

  test("countMin: never under-counts, bounded over-count, partition-invariant") {
    val data = zipf(300, 3000)
    val df = data.toDF("tok").repartition(7)
    val sk = Sketch.countMin(df, "tok", depth = 4, width = 1024)
    assert(sk.n == data.size.toLong)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    truth.foreach { case (tok, c) =>
      val est = sk.estimate(tok)
      assert(est >= c, s"$tok under-counted: $est < $c")
      // standard CM bound: over-count <= 2n/width whp; allow 4x slack
      assert(est - c <= 8L * sk.n / 1024L, s"$tok over-count $est vs $c")
    }
    // deterministic across partitionings: same matrix bit-for-bit
    val again = Sketch.countMin(data.toDF("tok").repartition(3), "tok",
      depth = 4, width = 1024)
    assert(java.util.Arrays.equals(sk.table, again.table))
  }

  test("sketches survive empty input") {
    val empty = Seq.empty[String].toDF("tok")
    val mg = Sketch.misraGries(empty, "tok", k = 8)
    assert(mg.n == 0L && mg.entries.isEmpty)
    val cm = Sketch.countMin(empty, "tok", depth = 2, width = 64)
    assert(cm.n == 0L && cm.estimate("anything") == 0L)
  }

  test("misraGriesSharded replays the pinned-order fold, any partitioning") {
    // reference: sequential foldToken per shard + left-fold mergeBuffers
    // in shard order, on the driver
    val k = 4
    val stream = zipf(40, 200).zipWithIndex
      .map { case (t, p) => (p.toLong / 97L, p.toLong, t) }
    def reference: Seq[(String, Long)] = {
      val byShard = stream.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          val b = Sketch.emptyBuffer
          rows.sortBy(_._2).foreach(r => Sketch.foldToken(b, r._3, k))
          b
        }
      val m = byShard.reduceLeft((a, b) => Sketch.mergeBuffers(a, b, k))
      m.counters.toSeq.sorted
    }
    for (parts <- Seq(1, 3, 16)) {
      val df = stream.toDF("shard", "pos", "tok").repartition(parts)
      val r = Sketch.misraGriesSharded(df, "shard", Seq("pos"), "tok", k)
      assert(r.n == stream.size)
      assert(r.entries.map(e => (e.token, e.estimate)).sorted == reference,
        s"parts=$parts")
    }
  }

  test("candidate exact pass broadcasts and semi-joins (no full-stream distinct)") {
    val df = zipf(300, 1500).toDF("tok")
    val plan = Sketch.heavyHitters(df, "tok", k = 256, minCount = 60L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"),
      s"candidates must broadcast semi-join:\n$plan")
  }
}
