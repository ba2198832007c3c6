package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the scale-safe two-pass id scans to the window-function semantics
  * they replaced (W2, razu/incrementer.py): same ids, no partition-less
  * WindowExec in the plan. */
class RelationalSpec extends SparkSuite {
  import spark.implicits._

  test("sequentialIds == row_number over the same total order") {
    val df = (1 to 997).map(i => (i * 7919 % 1000, s"v$i")).toDF("k", "v")
      .repartition(7) // scrambled input partitioning
    val got = Relational.sequentialIds(df, Seq(col("k"), col("v")), "id", 10L)
      .select("k", "v", "id")
    val want = df.withColumn("id",
      row_number().over(Window.orderBy(col("k"), col("v"))).cast("long") + 10L)
      .select("k", "v", "id")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() == 997)
  }

  test("sequentialIds has no Window in its plan") {
    val df = (1 to 100).toDF("k")
    val p = Relational.sequentialIds(df, Seq(col("k")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
  }

  test("sequentialIds on empty input") {
    val df = Seq.empty[Int].toDF("k")
    assert(Relational.sequentialIds(df, Seq(col("k"))).count() == 0)
  }

  test("duplicate order keys still get consistent, complete id sequences") {
    // heavily tied order column: the content-hash tiebreaker must keep
    // the two-pass scans self-consistent (ids are a permutation of 1..n)
    val df = (1 to 400).map(i => (i % 5, s"p$i")).toDF("k", "payload")
      .repartition(7)
    val ids = Relational.sequentialIds(df, Seq(col("k")))
      .select("seq_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 400L))
    val inter = Relational.interleavedSerieIds(df, Seq(col("k")), col("k"))
    val recs = inter.select("__recordId").collect().map(_.getLong(0))
    assert(recs.distinct.length == 400, "record ids must not collide")
    assert(inter.select("__rowIdx").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 400L))
  }

  test("interleavedSerieIds and global groupBreaks on empty and 1-row input") {
    val empty = Seq.empty[(Int, Integer)].toDF("ord", "Serie")
    assert(Relational.interleavedSerieIds(empty, Seq(col("ord")),
      col("Serie")).count() == 0)
    assert(Relational.groupBreaks(empty, Seq.empty, Seq(col("ord")),
      col("Serie")).count() == 0)
    val one = Seq((1, Integer.valueOf(7))).toDF("ord", "Serie")
    val ids = Relational.interleavedSerieIds(one, Seq(col("ord")), col("Serie"))
      .select("__rowIdx", "__brk", "__recordId", "__serieId", "__bestandId")
      .head()
    // first row is always a break: rowIdx=1, cumB=1, record=1+2=3,
    // serie=record-1=2, bestand=record+1=4 — the reference's
    // archive=1/serie=2/record=3/bestand=4 opening sequence
    assert(ids.getLong(0) == 1L && ids.getLong(1) == 1L)
    assert(ids.getLong(2) == 3L && ids.getLong(3) == 2L && ids.getLong(4) == 4L)
    val brk = Relational.groupBreaks(one, Seq.empty, Seq(col("ord")), col("Serie"))
      .select("is_break").head().getBoolean(0)
    assert(brk)
  }

  private def windowReference(df: org.apache.spark.sql.DataFrame,
                              order: Seq[org.apache.spark.sql.Column]) = {
    // the exact pre-round-3 formula (DemoCsv.scala history): single
    // global window — correct, just not scale-safe; used here as oracle
    val w = Window.orderBy(order: _*)
    df.withColumn("__rowIdx", row_number().over(w).cast("long"))
      .withColumn("__brk",
        coalesce(col("Serie") =!= lag(col("Serie"), 1).over(w), lit(true))
          .cast("long"))
      .withColumn("__cumB", sum("__brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__recordId", col("__cumB") + lit(2L) * col("__rowIdx"))
      .withColumn("__bestandId", col("__recordId") + 1L)
      .withColumn("__serieId", max(when(col("__brk") === 1L,
        col("__recordId") - 1L)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__cumB")
  }

  test("interleavedSerieIds == the window formula (incl. null series)") {
    // series with runs, singletons, and nulls (null => always a break)
    val rows = (1 to 500).map { i =>
      val serie: Integer =
        if (i % 97 == 0) null else Integer.valueOf(i / 13)
      (i, serie)
    }
    val df = rows.toDF("ord", "Serie").repartition(5)
    val order = Seq(col("ord"))
    val got = Relational.interleavedSerieIds(df, order, col("Serie"))
      .select("ord", "__rowIdx", "__brk", "__recordId", "__serieId", "__bestandId")
    val want = windowReference(df, order)
      .select("ord", "__rowIdx", "__brk", "__recordId", "__serieId", "__bestandId")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("global groupBreaks == partition-less window formula, without a Window") {
    val rows = (1 to 300).map { i =>
      val g: Integer = if (i % 83 == 0) null else Integer.valueOf(i / 7)
      (i, g)
    }
    val df = rows.toDF("ord", "g").repartition(5)
    val got = Relational.groupBreaks(df, Seq.empty, Seq(col("ord")), col("g"))
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    val w = Window.orderBy(col("ord"))
    val want = df.withColumn("is_break",
      coalesce(col("g") =!= lag(col("g"), 1).over(w), lit(true)))
    assert(got.select("ord", "is_break").except(want.select("ord", "is_break")).isEmpty)
    assert(want.select("ord", "is_break").except(got.select("ord", "is_break")).isEmpty)
  }

  test("interleavedSerieIds plan has no Window, and ids restart correctly " +
       "across many small partitions") {
    val df = (1 to 40).map(i => (i, i / 4)).toDF("ord", "Serie")
    val ids = Relational.interleavedSerieIds(df, Seq(col("ord")), col("Serie"))
    val p = ids.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    val want = windowReference(df, Seq(col("ord")))
      .select("ord", "__recordId", "__serieId")
    assert(ids.select("ord", "__recordId", "__serieId")
      .except(want).isEmpty)
  }

  test("asofJoin: most recent right row at-or-before, per key, null payloads win") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), // 5 precedes any right
      (4L, "b", 10L)                                 // key b: exact-ts tie
    ).toDF("lid", "k", "t")
    val right = Seq(
      ("a", 8L, 100L, Some("x")), ("a", 10L, 101L, None), // ts 10: ties left lid=1
      ("a", 15L, 102L, Some("y")),
      ("b", 10L, 103L, Some("z"))
    ).toDF("k", "t", "rid", "tag")
    val out = Relational.asofJoin(left, right, keys = Seq("k"), tsCol = "t",
        payload = Seq("rid", "tag"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
      .toMap
    // lid 1 (t=10): right t=10 is inclusive AND its null tag must not
    // fall back to the older t=8 row (struct payload semantics)
    assert(out(1L) == (Some(101L), None))
    assert(out(2L) == (Some(102L), Some("y"))) // most recent of 8/10/15
    assert(out(3L) == (None, None))            // nothing at-or-before 5
    assert(out(4L) == (Some(103L), Some("z"))) // equal-ts inclusive on key b
  }

  test("asofJoin: rightTieBreak resolves inside the payload struct") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L)).toDF("lid", "k", "t")
    // two right rows at the SAME (key, ts): the last in rid order wins
    val right = Seq(("a", 10L, 7L), ("a", 10L, 3L)).toDF("k", "t", "rid")
    val r = Relational.asofJoin(left, right, Seq("k"), "t", Seq("rid"),
      rightTieBreak = Seq("rid")).select("asof_rid").head()
    assert(r.getLong(0) == 7L)
  }

  test("rangeJoin: containment matches exactly once, plan is equi-join not nested-loop") {
    import spark.implicits._
    val points = Seq((1L, "a", 15L), (2L, "a", 100L), (3L, "b", 15L))
      .toDF("pid", "k", "t")
    val intervals = Seq(
      ("a", 10L, 20L, 100L),  // contains p1
      ("a", 12L, 40L, 101L),  // contains p1 (multi-bucket interval)
      ("a", 90L, 100L, 102L), // contains p2 (inclusive end)
      ("b", 16L, 30L, 103L)   // misses p3
    ).toDF("k", "s", "e", "iid")
    val out = Relational.rangeJoin(points, intervals, Seq("k"), "t", "s", "e",
        bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each qualifying pair exactly once even when the interval spans
    // several buckets
    assert(out == Set((1L, 100L), (1L, 101L), (2L, 102L)))
    val p = Relational.rangeJoin(points, intervals, Seq("k"), "t", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("asofJoin plan: one hash exchange on the key, no nested-loop join") {
    import spark.implicits._
    val left = (1L to 100L).map(i => (i, i % 5, i * 10)).toDF("lid", "k", "t")
    val right = (1L to 50L).map(i => (i, i % 5, i * 7)).toDF("rid", "k", "t")
    val p = Relational.asofJoin(left, right, Seq("k"), "t", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("windowspecdefinition(k"), p)
  }

  test("saltedJoin == plain inner join on skewed keys, incl. duplicates") {
    // 900 of 1000 fact rows hit key 1 (the hot key), dim has dup keys too
    val fact = (1 to 1000)
      .map(i => (if (i <= 900) 1L else i.toLong, s"f$i")).toDF("k", "fv")
    val dim = Seq((1L, "hot"), (1L, "hot2"), (950L, "cold")).toDF("k", "dv")
    val got = Relational.saltedJoin(fact, dim, "k", nSalt = 4)
      .orderBy("k", "fv", "dv").collect().map(_.toSeq).toSeq
    val want = fact.join(dim, Seq("k"))
      .orderBy("k", "fv", "dv").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.size == 1801) // 900*2 hot pairs + 1 cold
  }

  test("saltedJoin spreads the hot key: join keys include the salt") {
    val fact = (1 to 100).map(i => (1L, s"f$i")).toDF("k", "fv")
    val dim = Seq((1L, "d")).toDF("k", "dv")
    val p = Relational.saltedJoin(fact, dim, "k", nSalt = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("upsert: update wins, null field patches from base, inserts survive") {
    val base = Seq((1L, "p1", "A"), (2L, "p2", "B"), (4L, "p4", "D"))
      .toDF("k", "prio", "status")
    val upd = Seq((2L, "PATCH", null.asInstanceOf[String]),
      (6L, "NEW", "N")).toDF("k", "prio", "status")
    val got = Relational.upsert(base, upd, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, "p1", "A"),       // untouched base
      (2L, "PATCH", "B"),    // priority updated, null status inherits base
      (4L, "p4", "D"),
      (6L, "NEW", "N")))     // unmatched update inserts
  }

  test("upsert: updates may omit trailing non-key columns") {
    val base = Seq((1L, "p1", "A")).toDF("k", "prio", "status")
    val upd = Seq((1L, "P2")).toDF("k", "prio")
    val got = Relational.upsert(base, upd, Seq("k")).collect().head
    assert((got.getLong(0), got.getString(1), got.getString(2))
      == ((1L, "P2", "A")))
  }

  test("resampleFfill: gap fill, in-bucket last-wins, tie-break, per-key spans") {
    import org.apache.spark.sql.types._
    val hour = 3600L * 1000000L
    val rows = Seq(
      // key 1: obs in bucket 0 (two, later ts wins), gap at bucket 1,
      // obs in bucket 2
      (1L, 100L, 1L, Some(10.0)),
      (1L, 200L, 2L, Some(20.0)),           // same bucket, later ts -> wins
      (1L, 2 * hour + 5L, 3L, Some(30.0)),
      // key 2: ts tie in one bucket -> higher event_id wins; null-value
      // observation in bucket 1 carries the PREVIOUS value forward
      (2L, 50L, 4L, Some(1.0)),
      (2L, 50L, 5L, Some(2.0)),
      (2L, hour + 1L, 6L, None))
    val df = rows.toDF("user_id", "tus", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val got = Relational.resampleFfill(df, Seq("user_id"), "ts", 3600L,
        "value", tieBreak = Seq("event_id"))
      .orderBy("user_id", "bucket_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toDouble), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      (1L, 0L, Some(20.0), true),
      (1L, hour, Some(20.0), false),        // gap: carried forward
      (1L, 2 * hour, Some(30.0), true),
      (2L, 0L, Some(2.0), true),            // ts tie -> event_id 5 wins
      (2L, hour, Some(2.0), false)))        // null obs: carries, not observed
  }

  test("resampleFfill: single observation, leading bucket stays as-is") {
    val df = Seq((7L, 3600L * 1000000L * 4 + 9L, 1L, 5.5))
      .toDF("user_id", "tus", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val got = Relational.resampleFfill(df, Seq("user_id"), "ts", 3600L,
        "value").collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 3600L * 1000000L * 4)
    assert(got.head.getDouble(2) == 5.5 && got.head.getBoolean(3))
  }

  test("resampleFfill: multi-year span at hourly step crosses segment bounds") {
    // 10-year span at 1 h step = ~87,672 buckets — more than the 65,536
    // segment bound, so the grid must span 2 segments without ever
    // materializing one span-sized array (the round-6 100×-design flag)
    val hour = 3600L * 1000000L
    val span = 10L * 365 * 24 + 7 // hours; +7 to land mid-segment
    val df = Seq((1L, 0L, 1.0), (1L, span * hour + 5L, 2.0))
      .toDF("user_id", "tus", "value")
      .withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val got = Relational.resampleFfill(df, Seq("user_id"), "ts", 3600L, "value")
    assert(got.count() == span + 1)
    val edges = got.orderBy("bucket_us")
      .filter(col("observed") || col("bucket_us") === (span - 1) * hour)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(edges.toSeq == Seq((0L, 1.0, true),
      ((span - 1) * hour, 1.0, false), (span * hour, 2.0, true)))
    // a key whose span/step exceeds maxBucketsPerKey fails loudly
    // instead of silently generating billions of grid rows
    val e = intercept[Exception] {
      Relational.resampleFfill(df, Seq("user_id"), "ts", 3600L, "value",
        maxBucketsPerKey = 1000L).count()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("maxBucketsPerKey"),
      s"expected the loud guard, got: $msgs")
  }

  test("scd2History: collapses unchanged runs, versions changes, null-safe") {
    val ch = Seq(
      ("k1", 1L, Some("a")), // opens v1
      ("k1", 2L, Some("a")), // unchanged -> collapsed
      ("k1", 3L, Some("b")), // v2
      ("k1", 4L, None),      // value -> null IS a change (null-safe)
      ("k1", 5L, Some("b")), // null -> value change
      ("k2", 1L, None))      // single null-attr version
      .toDF("k", "ts", "attr")
    val got = Relational.scd2History(ch, Seq("k"), "ts", Seq("attr"))
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.toString),
        r.getLong(2), Option(r.get(3)).map(_.toString.toLong),
        r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      ("k1", Some("a"), 1L, Some(3L), false),
      ("k1", Some("b"), 3L, Some(4L), false),
      ("k1", None, 4L, Some(5L), false),
      ("k1", Some("b"), 5L, None, true),
      ("k2", None, 1L, None, true)))
  }

  test("scd2History: single shuffle on the business key, no global sort") {
    val ch = (1 to 500).map(i => (i % 20, i.toLong, s"v${i % 3}"))
      .toDF("k", "ts", "attr")
      // one row per (k, ts): keep max attr
      .groupBy("k", "ts").agg(max("attr").as("attr"))
    val plan = Relational.scd2History(ch, Seq("k"), "ts", Seq("attr"))
      .queryExecution.executedPlan.toString
    // both windows partition by k — no partition-less WindowExec
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition(k"),
      plan)
    val nExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(nExchanges <= 2, s"expected <=2 hash exchanges, got $nExchanges:\n$plan")
  }

  private def rollingEvents(rows: (Long, Long, Long, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"),
        col("value"))
  }

  test("rolling features: RANGE frame counts time, not rows; boundary inclusive") {
    val S = 1000000L // one second in micros
    val out = Relational.rollingWindowFeatures(
        rollingEvents(
          (1L, 7L, 0L, 1.0),
          (2L, 7L, 5 * S, 2.0),    // 5s after e1
          (3L, 7L, 10 * S, 4.0),   // exactly 10s after e1: inclusive
          (4L, 7L, 100 * S, 8.0),  // far later: alone in its window
          (5L, 8L, 6 * S, 16.0)),  // other user: never mixed in
        windows = Seq("10s" -> 10 * S))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((2L, 3.0)))
    assert(out(3L) == ((3L, 7.0))) // e1 at the exact -10s boundary counts
    assert(out(4L) == ((1L, 8.0)))
    assert(out(5L) == ((1L, 16.0)))
  }

  test("rolling features: several windows share one exchange and one window node") {
    val df = Relational.rollingWindowFeatures(
      rollingEvents((1L, 7L, 0L, 1.0)),
      windows = Seq("1h" -> 3600000000L, "24h" -> 86400000000L))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"both windows must share one shuffle:\n$plan")
    assert("Window ".r.findAllIn(plan).length == 1,
      s"same partition+order => one WindowExec:\n$plan")
  }
}
