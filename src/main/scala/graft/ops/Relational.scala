package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The reference's relational operator shapes (SURVEY §2), generalized as
  * reusable DataFrame combinators. Each is a thin declarative composition —
  * Catalyst plans/partitions/pushes-down; these exist so pipelines share one
  * audited implementation of each semantic.
  *
  * Scale notes are per-operator; nothing here collects to the driver.
  */
object Relational {

  /** F9/J5 — "skip if exists": rows of `df` whose key is absent from
    * `existing` (razu/edepot.py:137-142 skip-upload semantics). Anti joins
    * broadcast automatically when `existing` is small; pass
    * `broadcast(existing)` to force.
    */
  def antiJoin(df: DataFrame, existing: DataFrame, joinExpr: Column): DataFrame =
    df.join(existing, joinExpr, "left_anti")

  /** F3/J6 — keep rows with at least one match (has-referenced-file
    * predicate, razu/meta_resource.py:104-106). */
  def semiJoin(df: DataFrame, other: DataFrame, joinExpr: Column): DataFrame =
    df.join(other, joinExpr, "left_semi")

  /** As-of join — attach to each left row the payload of the most recent
    * right row with `right.ts <= left.ts` under the same keys (the
    * time-series join Spark lacks natively; DuckDB `ASOF JOIN` is the
    * oracle). Union-tag shape: ONE hash shuffle on the key columns, a
    * key-partitioned sort, and a running last-non-null window — never a
    * range condition the planner would turn into a broadcast-nested-loop,
    * and no per-key state beyond the window frame, so 100M rows per key
    * stream through a single sorted pass. Right rows order BEFORE left
    * rows at equal ts (inclusive semantics, = DuckDB's `l.ts >= r.ts`).
    * The payload travels as ONE struct so a right row whose payload
    * column is genuinely null still wins over an older row.
    * Ties between right rows at identical (keys, ts) are broken by
    * `rightTieBreak` — names of PAYLOAD columns, ascending; the last
    * one in that order wins (pass it when ts is not unique per key;
    * they resolve inside the payload struct, so left rows — whose
    * struct is null — are unaffected).
    * Output: every left column, then `prefix`-renamed payload columns
    * (null when no right row precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payload: Seq[String],
               prefix: String = "asof_",
               rightTieBreak: Seq[String] = Nil): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val pStruct = struct(payload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val pType = right.select(pStruct.as("s")).schema("s").dataType
    val lPrep = left.select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(pType).as("__p")): _*)
    // a null right ts matches nothing (ASOF `l.ts >= r.ts` is null-false
    // in SQL); without this filter nulls-first ordering would make such
    // a row the "oldest" and hand its payload to every early left row.
    // (A null LEFT ts needs no guard: it sorts before every real right
    // row, so its running last-non-null is empty -> null payload.)
    val rPrep = right.filter(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), pStruct.as("__p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +:
        rightTieBreak.map(f => col(s"__p.$f").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rPrep)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c")) ++
        payload.map(c => col(s"__m.$c").as(s"$prefix$c")): _*)
  }

  /** Range (interval) join — pair each point row with every interval row
    * of the same keys whose `[startCol, endCol]` contains `tsCol`
    * (inclusive ends). A naive range predicate plans as a nested-loop
    * join; this bucketizes instead: points hash to their one
    * `ts div bucketWidth` bucket, intervals EXPLODE to every bucket they
    * overlap, and the join is a plain equi-join on (keys, bucket) with
    * the exact BETWEEN re-checked after. A point lands in exactly one
    * bucket, so each qualifying pair appears exactly once — no dedup
    * stage. Cost scales with interval-length/bucketWidth replication:
    * pick `bucketWidth` around the typical interval length (a mega
    * interval replicates length/width times — bounded, never all-pairs).
    * `points` and `intervals` must share ONLY the key columns; all
    * columns of both sides are returned. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                tsCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      expr(s"CAST($tsCol AS BIGINT) div $bucketWidth"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"CAST($startCol AS BIGINT) div $bucketWidth"),
        expr(s"CAST($endCol AS BIGINT) div $bucketWidth"))))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(tsCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bucket")
  }

  /** Salted inner equi-join — the skew-mitigation shape for a fact key
    * whose hottest value overwhelms one reducer (AQE's skew-join splits
    * post-hoc; salting PRE-SPREADS, which also covers aggregates-after-
    * join and engines/configs without AQE). The dim side replicates
    * `nSalt`× with a salt column; each fact row picks ONE deterministic
    * salt from a hash of the whole row (any value is correct — salt only
    * routes; a hash keeps re-runs identical), and the join key becomes
    * (key, salt), spreading each hot key over nSalt reducers. Result ==
    * the plain inner equi-join, row for row (the q67 oracle is exactly
    * that SQL join). Cost: dim shuffles nSalt× its size — use for
    * mid-size dims where broadcast doesn't fit; keep nSalt ~ the skew
    * factor, not the cluster size. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 nSalt: Int = 8): DataFrame = {
    require(nSalt > 0, "nSalt must be positive")
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until nSalt).map(lit): _*)))
    fact.withColumn("__salt",
        pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(nSalt)).cast("int"))
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** SCD2 history build — fold a change stream (one row per key per
    * timestamp; pre-aggregate duplicates first) into slowly-changing-
    * dimension type-2 intervals: consecutive rows whose tracked
    * attributes are unchanged collapse into one validity interval;
    * each surviving change opens an interval [valid_from, valid_to)
    * closed by the NEXT change of the same key (null valid_to =
    * current version). The lakehouse upsert-compaction shape: turn an
    * append-only CDC log into a queryable dimension history.
    *
    * Two windows, both PARTITIONED by the business key and ordered by
    * `tsCol` — ONE hash exchange on the key; the second window (over
    * change-surviving rows) reuses the first's partitioning, so the
    * plan at 1000 executors is a single shuffle keyed by the dimension
    * key, parallel across keys, never a global sort. Null-safe change
    * detection (`<=>` on the attribute struct), so a null→value or
    * value→null transition versions correctly. */
  def scd2History(changes: DataFrame, keys: Seq[String], tsCol: String,
                  attrCols: Seq[String]): DataFrame = {
    val attrs = struct(attrCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    changes
      // a key's first row has a null __prev struct, and null <=> struct
      // is false — so the first version is kept by the same predicate
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(!(col("__prev") <=> attrs))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Time-series resample + forward fill — regularize an irregular event
    * stream onto a fixed grid (one row per key per `stepSeconds` bucket
    * between that key's first and last observation), carrying the last
    * observed value across gaps. The feature-engineering shape every
    * time-series pipeline needs (gap-free input for joins/models).
    *
    * Distributed end-to-end, no driver loop, every stage keyed:
    * (1) last-observation-per-bucket via a (keys, bucket)-partitioned
    * row_number (deterministic under timestamp ties via `tieBreak`);
    * (2) per-key [min, max] bucket span → a TWO-LEVEL
    * `sequence`+`explode` generates the grid ON EXECUTORS: segment
    * starts first, then ≤65536 buckets within each segment, so no
    * single row ever materializes more than a 64k-element array — a
    * one-level sequence put a key's ENTIRE span in one in-memory array,
    * which a corrupt far-past timestamp (or a 1 s step over years)
    * turns into a task OOM; (3) left join grid↔observations on
    * (keys, bucket); (4) forward fill = running `last(ignoreNulls)` over
    * the key-partitioned bucket order. At 1000 executors each stage
    * shuffles on the key (or key+bucket) — no global sort, no skew
    * beyond the keys' own span sizes. A key whose span/step exceeds
    * `maxBucketsPerKey` fails LOUDLY inside the plan (assert_true on
    * the span row) instead of silently exploding billions of grid rows.
    *
    * Output: keys ++ (bucket_us: bigint, valueCol: filled value,
    * observed: whether this bucket had its own observation). Leading
    * buckets before a key's first non-null observation stay null. */
  def resampleFfill(df: DataFrame, keys: Seq[String], tsCol: String,
                    stepSeconds: Long, valueCol: String,
                    tieBreak: Seq[String] = Nil,
                    maxBucketsPerKey: Long = 100000000L): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    require(maxBucketsPerKey > 0, "maxBucketsPerKey must be positive")
    val stepUs = Math.multiplyExact(stepSeconds, 1000000L)
    val withB = df.withColumn("__b",
      expr(s"unix_micros($tsCol) div $stepUs") * lit(stepUs))
    // last observation per bucket as a max_by hash AGGREGATE, not a
    // row_number window: partial aggregation combines map-side, so the
    // shuffle carries one row per (key, bucket) instead of every event
    // sorted — the difference at 100 TB event volumes
    val ord = struct((col(tsCol) +: tieBreak.map(col)): _*)
    val vals = withB.groupBy((keys :+ "__b").map(col): _*)
      .agg(max_by(col(valueCol), ord).as(valueCol))
    // two-level grid: segment starts, then buckets within the segment —
    // bounds every materialized sequence() array at segElems elements
    // (segElems clamped so stepUs * segElems cannot overflow a Long)
    val segElems = math.max(1L, math.min(65536L, Long.MaxValue / stepUs))
    val segStep = stepUs * segElems
    val grid = withB.groupBy(keys.map(col): _*)
      .agg(min("__b").as("__lo"), max("__b").as("__hi"))
      // integer `div`, not `/` (Divide returns DOUBLE): keeps the
      // maxBucketsPerKey guard an exact long comparison — and the
      // error message prints a count, not a float — even for spans
      // past 2^53 µs where a double bucket count is inexact
      .withColumn("__nb", expr(s"(__hi - __lo) div $stepUs") + 1)
      // assert_true returns NULL on success, so coalesce keeps the
      // guard in the plan (an unreferenced check column gets pruned)
      .withColumn("__lo", coalesce(
        assert_true(col("__nb") <= maxBucketsPerKey,
          concat(lit("resampleFfill: a key's grid needs "), col("__nb"),
            lit(s" buckets (> maxBucketsPerKey=$maxBucketsPerKey) — " +
              "corrupt timestamp or too-small stepSeconds?"))).cast("long"),
        col("__lo")))
      .select(keys.map(col) ++ Seq(col("__hi"),
        explode(sequence(col("__lo"), col("__hi"), lit(segStep))).as("__s")): _*)
      .select(keys.map(col) :+
        explode(sequence(col("__s"),
          // segment end WITHOUT `__s + (segStep-stepUs)`: that sum can
          // wrap for buckets near Long.MaxValue; the subtraction form
          // only adds when the result provably stays <= __hi
          when(col("__hi") - col("__s") <= lit(segStep - stepUs),
            col("__hi"))
            .otherwise(col("__s") + lit(segStep - stepUs)),
          lit(stepUs))).as("__b"): _*)
    val wFF = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(vals, keys :+ "__b", "left")
      .select(keys.map(col) ++ Seq(
        col("__b").as("bucket_us"),
        last(col(valueCol), ignoreNulls = true).over(wFF).as(valueCol),
        col(valueCol).isNotNull.as("observed")): _*)
  }

  /** Patch-style upsert (the lakehouse MERGE shape): `updates` rows win
    * on key match, unmatched updates insert, unmatched base rows
    * survive. Field-level PATCH semantics: a NULL field in an update
    * inherits the base value (coalesce per non-key column) — callers
    * that need null-overwrite semantics should pre-fill sentinel
    * values. One full-outer equi-join on the key: shuffles both sides
    * on the key once, parallel across keys at any scale; with a small
    * updates side Catalyst/AQE degrades it to a broadcast-able shape.
    * Both inputs must share the base schema; `updates` may omit
    * trailing columns it never patches. */
  def upsert(base: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame = {
    val nonKeys = base.columns.filterNot(keys.contains).toSeq
    val u = updates.select(updates.columns.toSeq.map { c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__u_$c")
    }: _*)
    base.join(u, keys, "full_outer")
      .select(keys.map(col) ++ nonKeys.map { c =>
        if (u.columns.contains(s"__u_$c")) coalesce(col(s"__u_$c"), col(c)).as(c)
        else col(c)
      }: _*)
  }

  /** J4/F8 — manifest diff: rows of `current` that are new or changed vs
    * `reference` (tools/sip2localstorage.py:76-94, razu/edepot.py:87-106).
    * Left join on `key`; keep when the reference row is missing or its
    * `refHash` differs from `curHash`.
    */
  def changedOrNew(current: DataFrame, reference: DataFrame,
                   key: Column, curHash: Column, refHash: Column): DataFrame =
    current.join(reference, key, "left_outer")
      .filter(refHash.isNull || curHash =!= refHash)

  /** T3 — manifest-vs-directory reconciliation (razu/manifest.py:185-221):
    * full outer join of (key, hash) sides a/b → status column:
    * 'missing' (a only), 'extra' (b only), 'mismatch', 'ok'.
    * Shuffles both sides on the key — at 100 TB pre-bucket both manifests
    * by key to make this a zero-shuffle sort-merge join.
    */
  def reconcile(a: DataFrame, b: DataFrame, keyCol: String,
                aHash: Column, bHash: Column): DataFrame = {
    a.join(b, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(bHash.isNull && aHash.isNotNull, lit("missing"))
          .when(aHash.isNull && bHash.isNotNull, lit("extra"))
          .when(aHash =!= bHash, lit("mismatch"))
          .otherwise(lit("ok")))
  }

  /** W2 — deterministic sequential id assignment (razu/incrementer.py:1-11):
    * ids follow an explicit total order — NEVER
    * monotonically_increasing_id (not stable across partitioning).
    *
    * Scale-safe two-pass shape (NOT a partition-less `Window.orderBy`,
    * which funnels every row through one task): range-repartition on the
    * order keys, sort within partitions, then `zipWithIndex` — Spark's
    * zipWithIndex runs a cheap count job for per-partition offsets and a
    * second partition-local pass that assigns `offset + global index + 1`.
    * Both passes reuse the one range shuffle; no stage sees more than a
    * partition of data. Ids are deterministic when `order` is a total
    * order (ties fall to range-partition placement, same as row_number).
    */
  def sequentialIds(df: DataFrame, order: Seq[Column],
                    idCol: String = "seq_id", offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions((order ++ tiebreaker(df)): _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(indexed, schema)
  }

  /** W1 — ordered group-break detection (serie breaks,
    * csv2rdf.py:90-114): flag rows where `groupCol` differs from its
    * predecessor in `order` within `partition`. With partition keys this
    * is an ordinary partitioned window; with NO partition (one global
    * sequence) it uses the same two-pass shape as [[interleavedSerieIds]]
    * — range shuffle + per-partition edge values — instead of a
    * partition-less window that would funnel all rows into one task.
    */
  def groupBreaks(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                  groupCol: Column, flag: String = "is_break"): DataFrame =
    if (partition.nonEmpty) {
      val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      df.withColumn(flag,
        coalesce(groupCol =!= lag(groupCol, 1).over(w), lit(true)))
    } else globalGroupBreaks(df, order, groupCol, flag)

  private def globalGroupBreaks(df: DataFrame, order: Seq[Column],
                                groupCol: Column, flag: String): DataFrame = {
    val spark = df.sparkSession
    val keyed = df.withColumn("__grp_key", groupCol.cast("string"))
    val sorted = keyed.repartitionByRange(order: _*)
      .sortWithinPartitions((order ++ tiebreaker(keyed)): _*)
    val grpIdx = sorted.schema.fieldIndex("__grp_key")
    val rdd = sorted.rdd
    // pass 1: per-partition edge values (only first/last matter here)
    val edges = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var first: String = null; var last: String = null
      it.foreach { row =>
        val cur = row.getString(grpIdx)
        if (n == 0L) first = cur
        last = cur; n += 1
      }
      Iterator.single((pid, n, first, last))
    }.collect().sortBy(_._1)
    val incoming = Array.ofDim[(Boolean, String)](edges.length)
    var havePrev = false; var prev: String = null
    edges.foreach { case (pid, n, first, last) =>
      incoming(pid) = (havePrev, prev)
      if (n > 0) { havePrev = true; prev = last }
    }
    val bc = spark.sparkContext.broadcast(incoming)
    val schema = StructType(sorted.schema.fields :+
      StructField(flag, org.apache.spark.sql.types.BooleanType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var (havePrev, prev) = bc.value(pid)
      it.map { row =>
        val cur = row.getString(grpIdx)
        val brk = !havePrev || isBreak(prev, cur)
        havePrev = true; prev = cur
        Row.fromSeq(row.toSeq :+ brk)
      }
    }
    spark.createDataFrame(out, schema).drop("__grp_key")
  }

  /** A7 — set-semantics dedup of a triple-shaped (or any) DataFrame
    * (rdflib Graph.add idempotency, razu/rdf_resource.py:25-31). */
  def distinctRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** O4-style keep-first: one surviving row per key, chosen by `order`
    * (exact-dedup keep-first; also the backbone of A8 group-to-one).
    * Shuffle on key, no global sort.
    */
  def keepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1).drop("__rn")

  /** Within-partition tiebreaker for the two-pass scans: a hash of every
    * hashable column, appended to the sort keys. The two passes execute
    * the sorted lineage in two SEPARATE jobs; a local sort is only stable
    * per execution, so with non-total `order` keys a shuffle-fetch
    * reorder of tied rows between the jobs could make the stats pass
    * disagree with the output pass (inconsistent offsets → colliding
    * ids). Hashing the row content makes the order total up to fully
    * identical rows, which are interchangeable. */
  private def tiebreaker(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    val hashable: DataType => Boolean = {
      case StringType | BooleanType | ByteType | ShortType | IntegerType |
           LongType | FloatType | DoubleType | DateType | TimestampType |
           BinaryType => true
      case _: DecimalType => true
      case _ => false
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    if (cols.isEmpty) Seq.empty else Seq(xxhash64(cols.toSeq: _*))
  }

  /** Per-partition summary for the two-pass interleaved scan: `first`/`last`
    * are the serie keys at the partition edges (null = the cell was null),
    * `internalBreaks` counts breaks at local rows >= 1, `lastBrkIdx` is the
    * local index of the last internal break (-1 = none). */
  private case class PartStat(pid: Int, n: Long, first: String, last: String,
                              internalBreaks: Long, lastBrkIdx: Long)

  private def isBreak(prev: String, cur: String): Boolean =
    prev == null || cur == null || prev != cur

  /** W1+W2 — the reference's interleaved Incrementer id algebra
    * (razu/incrementer.py + csv2rdf.py row loop) as a scale-safe two-pass
    * scan. Appends to every row, in the total order given by `order`:
    *
    *   __rowIdx    1-based global row number
    *   __brk       1 when `serie` differs from its predecessor (null-safe:
    *               either side null => break; first row => break)
    *   __recordId  cumulative breaks (incl. this row) + 2 * __rowIdx
    *   __serieId   most recent break row's __recordId - 1 (carried forward)
    *   __bestandId __recordId + 1
    *
    * Shape: one range shuffle + partition-local sort, a stats pass
    * collecting (count, edge serie values, internal breaks) per partition
    * — O(numPartitions) at the driver — then a partition-local scan with
    * broadcast incoming offsets. Replaces the previous partition-less
    * window (every row through one task at 100x scale).
    */
  def interleavedSerieIds(df: DataFrame, order: Seq[Column],
                          serie: Column): DataFrame = {
    val spark = df.sparkSession
    val keyed = df.withColumn("__serie_key", serie.cast("string"))
    val sorted = keyed.repartitionByRange(order: _*)
      .sortWithinPartitions((order ++ tiebreaker(keyed)): _*)
    val serieIdx = sorted.schema.fieldIndex("__serie_key")
    val rdd = sorted.rdd

    val stats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var first: String = null; var last: String = null
      var internal = 0L; var lastBrk = -1L
      it.foreach { row =>
        val cur = row.getString(serieIdx)
        if (n == 0L) first = cur
        else if (isBreak(last, cur)) { internal += 1; lastBrk = n }
        last = cur; n += 1
      }
      Iterator.single(PartStat(pid, n, first, last, internal, lastBrk))
    }.collect().sortBy(_.pid)

    // driver walk over O(numPartitions) stats: incoming (rows, breaks,
    // previous serie, carried serieId) per partition
    val incoming = Array.ofDim[(Long, Long, Boolean, String, Long)](stats.length)
    var rowsBefore = 0L; var breaksBefore = 0L
    var havePrev = false; var prevSerie: String = null; var carry = 0L
    stats.foreach { s =>
      incoming(s.pid) = (rowsBefore, breaksBefore, havePrev, prevSerie, carry)
      if (s.n > 0) {
        val firstBrk = !havePrev || isBreak(prevSerie, s.first)
        val breaksIn = s.internalBreaks + (if (firstBrk) 1L else 0L)
        if (breaksIn > 0) {
          val lastBrkIdx = if (s.lastBrkIdx >= 0) s.lastBrkIdx else 0L
          val cumBAtLast = breaksBefore + breaksIn
          val rowIdxAtLast = rowsBefore + lastBrkIdx + 1
          carry = cumBAtLast + 2 * rowIdxAtLast - 1
        }
        rowsBefore += s.n; breaksBefore += breaksIn
        prevSerie = s.last; havePrev = true
      }
    }
    val bc = spark.sparkContext.broadcast(incoming)

    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField("__rowIdx", LongType, nullable = false),
      StructField("__brk", LongType, nullable = false),
      StructField("__recordId", LongType, nullable = false),
      StructField("__serieId", LongType, nullable = false),
      StructField("__bestandId", LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val (rows0, breaks0, havePrev0, prev0, carry0) = bc.value(pid)
      var havePrev = havePrev0; var prev = prev0
      var cumB = breaks0; var carried = carry0; var local = 0L
      it.map { row =>
        val cur = row.getString(serieIdx)
        val brk = !havePrev || isBreak(prev, cur)
        if (brk) cumB += 1
        val rowIdx = rows0 + local + 1
        val recordId = cumB + 2 * rowIdx
        if (brk) carried = recordId - 1
        havePrev = true; prev = cur; local += 1
        Row.fromSeq(row.toSeq ++ Seq(rowIdx, if (brk) 1L else 0L,
          recordId, carried, recordId + 1))
      }
    }
    spark.createDataFrame(out, schema).drop("__serie_key")
  }

  /** Rolling TIME-window features per key — the standard feature-
    * engineering shape ("events by this user in the trailing hour/day")
    * for fraud scoring, rate limiting, and ML feature tables: for every
    * event, the count and value-sum of the SAME key's events inside
    * each trailing window `[ts - w, ts]` (inclusive both ends — ties at
    * the exact boundary count, identically in both engines).
    *
    * RANGE frames over the numeric event-time (unix micros), NOT row
    * frames: row frames count a fixed number of rows regardless of how
    * much time they span, which is wrong whenever event density varies
    * — exactly when a trailing-window feature matters. All windows
    * share one (key, ts) sort, so the plan is ONE hash exchange + ONE
    * sort + one WindowExec regardless of how many window lengths are
    * requested; sums are computed over decimal so the result is
    * bit-exact across engines and frame-internal orders (a double sum
    * would depend on unspecified within-frame order).
    *
    * Output: the key, ts_us, and (n_<name>, sum_<name>) per window. */
  def rollingWindowFeatures(events: DataFrame,
                            windows: Seq[(String, Long)],
                            keyCol: String = "user_id",
                            tsCol: String = "ts",
                            valueCol: String = "value",
                            idCol: String = "event_id"): DataFrame = {
    require(windows.nonEmpty, "need at least one window")
    val base = events.select(col(idCol).cast("long").as(idCol),
      col(keyCol).cast("long").as(keyCol),
      unix_micros(col(tsCol)).as("ts_us"),
      col(valueCol).cast("decimal(18,2)").as("__v"))
    val featureCols = windows.flatMap { case (name, micros) =>
      val w = Window.partitionBy(keyCol).orderBy("ts_us")
        .rangeBetween(-micros, 0)
      Seq(count(lit(1)).over(w).as(s"n_$name"),
        sum(col("__v")).over(w).cast("double").as(s"sum_$name"))
    }
    base.select(
      Seq(col(idCol), col(keyCol), col("ts_us")) ++ featureCols: _*)
  }
}
