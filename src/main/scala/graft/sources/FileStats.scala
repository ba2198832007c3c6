package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** FILE-LEVEL data skipping on the bucketed contract — the missing
  * layer between the generation manifest (which files exist) and
  * parquet's own row-group skipping (which needs every file's footer
  * OPENED before it can skip anything). At 100 TB a time-range query
  * against an append-mostly table should not plan a task per file: the
  * per-file min/max already sitting in every parquet FOOTER prunes the
  * file list on the driver, and the scan that Spark plans afterwards
  * contains only the surviving files.
  *
  * Stats are DERIVED metadata, never part of the commit protocol: they
  * are read from the footers of the head generation's files on first
  * use and cached in-process keyed by (table location, generation), so
  * any commit — append, merge, compact — naturally invalidates them by
  * advancing the generation. A cross-process reader rebuilds them with
  * the same footer pass; there is no sidecar file to tear, race, or
  * repair. The footer pass is metadata-only (no data pages) and runs
  * as a SPARK JOB once the file count outgrows a driver loop — at
  * 100k files that is one short stage of footer opens across the
  * cluster, not a sequential driver crawl; under the threshold the
  * driver reads them directly (no job-scheduling overhead on the
  * handful-of-files case).
  *
  * Pruning is CONSERVATIVE — a file is dropped only when its stats
  * PROVE it cannot match: its column's [min, max] misses [lo, hi] in a
  * comparable domain, or every value in it is null (BETWEEN never
  * matches null). Missing stats, unknown physical types (e.g. INT96
  * timestamps), or a domain mismatch between the stats and the bounds
  * all KEEP the file, and the real predicate is re-applied to the
  * surviving rows regardless — so a pruned read can never return
  * different rows than the full scan, only read fewer files.
  *
  * WHEN it wins: the stat column must correlate with file placement —
  * time-ordered appends (each append's files cover that batch's time
  * span), range-clustered writes, or a [[graft.ops.Layout]] Z-order
  * pass ([[graft.ops.Layout.saveClustered]] prunes on BOTH clustered
  * columns). A column hashed across buckets (the bucket key itself)
  * spreads every value range over every file and prunes nothing —
  * that is what bucket pruning is for. */
object FileStats {

  /** Comparable stat key: numeric domain (ints, longs, floats,
    * date→epoch-day, instant/INT64-timestamp→epoch-micros) or UTF-8
    * string domain. Serializable — footer stats may be gathered on
    * executors. */
  type Key = Either[BigDecimal, String]

  /** One column's aggregated footer stats for one file: min/max over
    * all row groups in the comparable domain (None = unknown or not
    * comparable), allNull = every value in the file is provably null,
    * nullCount = the file's total nulls in the column when every row
    * group recorded it (None = at least one didn't — unusable for
    * metadata aggregation). */
  final case class ColStat(min: Option[Key], max: Option[Key],
                           allNull: Boolean,
                           nullCount: Option[Long] = None)

  /** One file's footer stats: total row count + per-column stats. */
  final case class FileStat(rows: Long, cols: Map[String, ColStat])

  // (table location, generation) -> file name -> stats.
  // Generation-keyed: any commit invalidates by advancing the key.
  private val cache =
    new ConcurrentHashMap[(String, Long), Map[String, FileStat]]()

  // below this many files a driver loop beats a job's scheduling cost
  private val DriverReadMax = 32

  /** Per-file footer stats of the table's HEAD generation (cached per
    * (location, generation) in-process). */
  def statsOf(spark: SparkSession,
              table: String): Map[String, FileStat] = {
    val (gen, files) = Bucketed.currentDataFiles(spark, table)
    val loc = new Path(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
    // a run-forever process commits thousands of generations; stats of
    // superseded ones are dead weight — keep only the head's per table
    cache.keySet.removeIf(k => k._1 == loc.toString && k._2 != gen)
    cache.computeIfAbsent((loc.toString, gen), _ => {
      val conf = spark.sparkContext.hadoopConfiguration
      if (files.size <= DriverReadMax) {
        // a footer open costs ~100 ms even locally — thread the driver
        // loop so the handful-of-files case stays sub-second
        import scala.concurrent.{Await, Future, ExecutionContext}
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(
          Future.traverse(files)(f => Future(
            f.getPath.getName -> footerStats(conf, f.getPath))),
          scala.concurrent.duration.Duration(600, "s")).toMap
      }
      else {
        // one short metadata-only stage: footer opens parallelize
        // across the cluster instead of crawling the driver. Hadoop
        // Configuration is not serializable — ship its entries and
        // rebuild per executor partition.
        val entries = {
          val it = conf.iterator()
          val b = Seq.newBuilder[(String, String)]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
          b.result()
        }
        val bc = spark.sparkContext.broadcast(entries)
        val paths = files.map(_.getPath.toString)
        spark.sparkContext
          .parallelize(paths,
            math.min(paths.size,
              math.max(1, spark.sparkContext.defaultParallelism * 2)))
          .mapPartitions { ps =>
            val c = new Configuration(false)
            bc.value.foreach { case (k, v) => c.set(k, v) }
            ps.map(p => new Path(p).getName -> footerStats(c, new Path(p)))
          }
          .collect().toMap
      }
    })
  }

  /** The head generation's file paths split by the range predicate:
    * (kept, pruned). Kept = stats cannot rule the file out. */
  def splitFiles(spark: SparkSession, table: String, column: String,
                 lo: Any, hi: Any): (Seq[Path], Seq[Path]) = {
    val stats = statsOf(spark, table)
    val (_, files) = Bucketed.currentDataFiles(spark, table)
    val (loK, hiK) = (toKey(lo), toKey(hi))
    val (kept, pruned) = files.partition { f =>
      stats.get(f.getPath.getName).flatMap(_.cols.get(column)) match {
        case Some(st) if st.allNull => false
        case Some(ColStat(Some(mn), Some(mx), _, _)) =>
          (loK, hiK) match {
            case (Some(l), Some(h))
              if sameDomain(mn, l) && sameDomain(mx, h) =>
              !(cmp(mx, l) < 0 || cmp(mn, h) > 0)
            case _ => true // incomparable bounds → keep (safe)
          }
        case _ => true // no stats → keep (safe)
      }
    }
    (kept.map(_.getPath), pruned.map(_.getPath))
  }

  /** How [[countWhere]] answered: rows counted, files answered from
    * METADATA alone (provably fully inside the range), files actually
    * scanned (range-boundary or stat-less), files pruned. */
  final case class CountResult(count: Long, coveredFiles: Int,
                               scannedFiles: Int, prunedFiles: Int)

  /** Metadata-only range COUNT: a file whose [min, max] lies FULLY
    * inside [lo, hi] (and whose null count is known) contributes
    * `rows − nulls` from its FOOTER — no data read at all; files the
    * stats prune contribute zero; only the range-BOUNDARY files (and
    * stat-less ones) are scanned, with the exact predicate. On a
    * time-ordered table a count over a wide range costs two boundary
    * files' scan + driver arithmetic, whatever the table's size — the
    * aggregation analogue of file skipping, and exactly as
    * conservative (anything uncertain is scanned, never guessed). */
  def countWhere(spark: SparkSession, table: String, column: String,
                 lo: Any, hi: Any): CountResult = {
    val stats = statsOf(spark, table)
    val (_, files) = Bucketed.currentDataFiles(spark, table)
    val (loK, hiK) = (toKey(lo), toKey(hi))
    // 0 = pruned, 1 = covered (metadata), 2 = scan
    def classOf(f: org.apache.hadoop.fs.FileStatus): Int =
      stats.get(f.getPath.getName) match {
        case Some(fs) => fs.cols.get(column) match {
          case Some(st) if st.allNull => 0
          case Some(ColStat(Some(mn), Some(mx), _, nc)) =>
            (loK, hiK) match {
              case (Some(l), Some(h))
                if sameDomain(mn, l) && sameDomain(mx, h) =>
                if (cmp(mx, l) < 0 || cmp(mn, h) > 0) 0
                else if (cmp(mn, l) >= 0 && cmp(mx, h) <= 0 && nc.isDefined) 1
                else 2
              case _ => 2
            }
          case _ => 2
        }
        case None => 2
      }
    val classed = files.map(f => f -> classOf(f))
    val covered = classed.collect { case (f, 1) =>
      val fs = stats(f.getPath.getName)
      fs.rows - fs.cols(column).nullCount.get
    }
    val toScan = classed.collect { case (f, 2) => f.getPath.toString }
    val scanned =
      if (toScan.isEmpty) 0L
      else {
        val schema = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)).schema
        spark.read.schema(schema).parquet(toScan: _*)
          .filter(col(column).between(lit(lo), lit(hi))).count()
      }
    CountResult(covered.sum + scanned, covered.size, toScan.size,
      classed.count(_._2 == 0))
  }

  /** Range read with file-level skipping: prune the head generation's
    * file list by footer min/max, scan only the survivors, and
    * re-apply the exact predicate (so parquet row-group skipping still
    * runs inside the kept files, and pruning can never change the
    * result — only the files read). */
  def loadBetween(spark: SparkSession, table: String, column: String,
                  lo: Any, hi: Any): DataFrame =
    loadWhere(spark, table, Seq((column, lo, hi)))

  /** CONJUNCTIVE multi-range read: a file survives only if NO range
    * rules it out, so each extra range can only shrink the file list —
    * on a [[graft.ops.Layout.saveClustered]] Morton layout a 2-D box
    * (x AND y) prunes to the files whose z-squares intersect the box,
    * strictly tighter than either 1-D range alone. All exact
    * predicates re-apply to the survivors (AND of BETWEENs). */
  def loadWhere(spark: SparkSession, table: String,
                ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "at least one (column, lo, hi) range")
    val schema = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).schema
    val kept = ranges.map { case (c, lo, hi) =>
      splitFiles(spark, table, c, lo, hi)._1.map(_.toString).toSet
    }.reduce(_ intersect _)
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(kept.toSeq.sorted: _*)
    ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(col(c).between(lit(lo), lit(hi)))
    }
  }

  /** EQUALITY read with bloom-filter file skipping — the point-lookup
    * path for a HIGH-CARDINALITY, UNCLUSTERED column, where min/max
    * cannot prune (every file spans the whole value range): if the
    * table was written with `parquet.bloom.filter.enabled#<col>`
    * ([[Bucketed.save]]'s writeOptions — maintenance rewrites re-apply
    * it from the stored table properties), a file whose every row
    * group's bloom filter rules the value out is provably matchless
    * and skips. Order of defenses: min/max first (free, already
    * cached), then blooms on the survivors (one footer + bloom-page
    * read per file, parallelized on a driver pool). Conservative like
    * all pruning here: a missing bloom, an unhashable type, or a
    * bloom false positive keeps the file, and the exact `=` predicate
    * re-applies to the survivors. */
  def loadEquals(spark: SparkSession, table: String, column: String,
                 value: Any): DataFrame = {
    val schema = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).schema
    val (surviving, _) = splitFilesEquals(spark, table, column, value)
    val base =
      if (surviving.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(surviving.map(_.toString): _*)
    base.filter(col(column) === lit(value))
  }

  /** The head generation's files split by an equality predicate:
    * (kept, pruned) after BOTH defenses — min/max range first, then
    * per-row-group bloom filters on the survivors. */
  def splitFilesEquals(spark: SparkSession, table: String,
                       column: String, value: Any): (Seq[Path], Seq[Path]) = {
    val (kept, prunedMm) = splitFiles(spark, table, column, value, value)
    val conf = spark.sparkContext.hadoopConfiguration
    import scala.concurrent.{Await, Future, ExecutionContext}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val checked = Await.result(
      Future.traverse(kept)(p => Future(
        p -> bloomMightContain(conf, p, column, value))),
      scala.concurrent.duration.Duration(600, "s"))
    val (surviving, bloomPruned) = checked.partition(_._2)
    (surviving.map(_._1), prunedMm ++ bloomPruned.map(_._1))
  }

  /** False only when EVERY row group of `p` has a bloom filter for
    * `column` and none might contain `value` — the provably-matchless
    * case. Anything uncertain (no bloom, unknown type) keeps. */
  private[sources] def bloomMightContain(conf: Configuration, p: Path,
                                         column: String, value: Any): Boolean = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      var i = 0
      while (i < blocks.size()) {
        val cc = blocks.get(i).getColumns
        var j = 0
        var found = false
        while (j < cc.size()) {
          val c = cc.get(j)
          if (c.getPath.toDotString == column) {
            found = true
            val bf = reader.readBloomFilter(c)
            if (bf == null) return true
            hashFor(bf, c.getPrimitiveType.getPrimitiveTypeName, value)
              match {
              case None => return true
              case Some(h) => if (bf.findHash(h)) return true
            }
          }
          j += 1
        }
        if (!found) return true // column absent (pre-evolution file)
        i += 1
      }
      false // every row group's bloom said no (or the file is empty)
    } finally reader.close()
  }

  private def hashFor(
      bf: org.apache.parquet.column.values.bloomfilter.BloomFilter,
      t: org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName,
      value: Any): Option[Long] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    (t, value) match {
      case (INT64, v: java.lang.Long) => Some(bf.hash(v.longValue))
      case (INT64, v: java.lang.Integer) => Some(bf.hash(v.longValue))
      case (INT32, v: java.lang.Integer) => Some(bf.hash(v.intValue))
      case (INT32, v: java.lang.Long) if v.longValue.isValidInt =>
        Some(bf.hash(v.intValue))
      case (DOUBLE, v: java.lang.Double) => Some(bf.hash(v.doubleValue))
      case (FLOAT, v: java.lang.Float) => Some(bf.hash(v.floatValue))
      case (BINARY, v: String) => Some(bf.hash(Binary.fromString(v)))
      case _ => None
    }
  }

  /** Metadata-first range MIN/MAX: over the files the range keeps,
    * the file-level min/max BOUND the answer — but a file's extremum
    * need not lie inside [lo, hi], so metadata alone answers only
    * when some file's whole span sits inside the range at the right
    * end. Strategy: compute the best PROVEN candidate (covered files'
    * stats), then scan only the files whose stats ADMIT a better
    * value inside the range — on a range-clustered table that is the
    * boundary files, whatever the table size. Conservative as ever:
    * any file with unusable stats is scanned. Returns (min, max) as
    * Spark values (None when no row matches). */
  def minMaxWhere(spark: SparkSession, table: String, column: String,
                  lo: Any, hi: Any): (Option[Any], Option[Any]) = {
    val (kept, _) = splitFiles(spark, table, column, lo, hi)
    if (kept.isEmpty) return (None, None)
    val stats = statsOf(spark, table)
    val (loK, hiK) = (toKey(lo), toKey(hi))
    def statOf(p: Path): Option[ColStat] =
      stats.get(p.getName).flatMap(_.cols.get(column))
    // a file whose span is fully inside the range (and null-countable)
    // PROVES its min/max are attained in-range
    // min/max need no null count: defined stats imply ≥1 non-null
    // value and parquet min/max range over the non-null values only
    def spanInRange(mn: Key, mx: Key): Boolean = (loK, hiK) match {
      case (Some(l), Some(h)) =>
        sameDomain(mn, l) && sameDomain(mx, h) &&
          cmp(mn, l) >= 0 && cmp(mx, h) <= 0
      case _ => false
    }
    def provenBounds(p: Path): Option[(Key, Key)] =
      statOf(p) match {
        case Some(ColStat(Some(mn), Some(mx), false, _))
          if spanInRange(mn, mx) => Some((mn, mx))
        case _ => None
      }
    val proven = kept.flatMap(provenBounds)
    val provenMin = proven.map(_._1).reduceOption((a, b) =>
      if (cmp(a, b) <= 0) a else b)
    val provenMax = proven.map(_._2).reduceOption((a, b) =>
      if (cmp(a, b) >= 0) a else b)
    // scan only files whose stats admit beating the proven bounds
    // inside the range (or whose stats are unusable)
    val toScan = kept.filter { p =>
      (statOf(p), provenBounds(p)) match {
        // fully covered: its in-range min/max ARE its file min/max,
        // already folded into the proven bounds — never scanned
        case (_, Some(_)) => false
        case (Some(ColStat(Some(mn), Some(mx), _, _)), None) =>
          // a boundary file matters only if its span ADMITS beating a
          // proven bound (file min below proven min / max above max);
          // with no proven bound yet, every boundary file matters
          val beatsMin = provenMin.forall(pm => cmp(mn, pm) < 0)
          val beatsMax = provenMax.forall(pm => cmp(mx, pm) > 0)
          beatsMin || beatsMax
        case _ => true // unusable stats → scan
      }
    }
    if (toScan.isEmpty)
      (provenMin.map(fromKey(_, lo)), provenMax.map(fromKey(_, lo)))
    else {
      val schema = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table)).schema
      import org.apache.spark.sql.functions.{max => smax, min => smin}
      val r = spark.read.schema(schema)
        .parquet(toScan.map(_.toString): _*)
        .filter(col(column).between(lit(lo), lit(hi)))
        .agg(smin(col(column)), smax(col(column))).head()
      val scanMin = Option(r.get(0))
      val scanMax = Option(r.get(1))
      def better(a: Option[Any], b: Option[Any], takeMin: Boolean) =
        (a.flatMap(toKey), b.flatMap(toKey)) match {
          case (Some(x), Some(y)) =>
            if ((cmp(x, y) <= 0) == takeMin) a else b
          case (Some(_), None) => a
          case _ => b
        }
      (better(provenMin.map(fromKey(_, lo)), scanMin, takeMin = true),
        better(provenMax.map(fromKey(_, lo)), scanMax, takeMin = false))
    }
  }

  /** Render a stats Key back into the caller's value domain, using the
    * bound value as the type witness (date/timestamp/long/string) — so
    * a metadata-only answer carries the SAME runtime type as a scanned
    * one, whatever the file layout chose. */
  private def fromKey(k: Key, witness: Any): Any = (k, witness) match {
    case (Left(n), _: java.time.LocalDate) =>
      java.time.LocalDate.ofEpochDay(n.toLong)
    case (Left(n), _: java.sql.Date) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.toLong))
    case (Left(n), _: java.time.Instant) =>
      java.time.Instant.ofEpochSecond(n.toLong / 1000000L,
        (n.toLong % 1000000L) * 1000L)
    case (Left(n), _: java.sql.Timestamp) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        n.toLong / 1000000L, (n.toLong % 1000000L) * 1000L))
    case (Left(n), _: java.time.LocalDateTime) =>
      java.time.LocalDateTime.ofEpochSecond(n.toLong / 1000000L,
        ((n.toLong % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (Left(n), _: java.lang.Double) => n.toDouble
    case (Left(n), _: java.lang.Float) => n.toFloat
    case (Left(n), _: java.lang.Integer) => n.toInt
    case (Left(n), _) => n.toLong
    case (Right(s), _) => s
  }

  /** All row groups' column stats of one file, merged per column — one
    * footer read, no data pages touched. Runs on the driver or an
    * executor (returns only serializable keys). */
  private def footerStats(conf: Configuration, p: Path): FileStat = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val perCol = scala.collection.mutable.Map.empty[String, ColStat]
      var rows = 0L
      reader.getFooter.getBlocks.forEach { b =>
        rows += b.getRowCount
        b.getColumns.forEach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          val nc =
            if (st != null && st.isNumNullsSet) Some(st.getNumNulls)
            else None
          val cur =
            if (st == null) ColStat(None, None, allNull = false, nc)
            else if (!st.hasNonNullValue)
              ColStat(None, None,
                allNull = st.isNumNullsSet && st.getNumNulls == c.getValueCount,
                nullCount = nc)
            else ColStat(toKey(st.genericGetMin), toKey(st.genericGetMax),
              allNull = false, nullCount = nc)
          perCol(name) = perCol.get(name).fold(cur)(merge(_, cur))
        }
      }
      FileStat(rows, perCol.toMap)
    } finally reader.close()
  }

  private def merge(a: ColStat, b: ColStat): ColStat = {
    // null counts sum across row groups; one unknown poisons the file
    val nc = for (x <- a.nullCount; y <- b.nullCount) yield x + y
    if (a.allNull && b.allNull) a.copy(nullCount = nc)
    else if (a.allNull) b.copy(nullCount = nc)
    else if (b.allNull) a.copy(nullCount = nc)
    else (a.min, a.max, b.min, b.max) match {
      case (Some(amn), Some(amx), Some(bmn), Some(bmx))
        if sameDomain(amn, bmn) && sameDomain(amx, bmx) =>
        ColStat(Some(if (cmp(amn, bmn) <= 0) amn else bmn),
          Some(if (cmp(amx, bmx) >= 0) amx else bmx), allNull = false,
          nullCount = nc)
      case _ => ColStat(None, None, allNull = false, nullCount = nc)
    }
  }

  // comparable domains: numeric (ints, longs, floats, date→epoch-day,
  // instant→epoch-micros) and UTF-8 string. Anything else → None (keep).
  private def toKey(v: Any): Option[Key] = v match {
    case n: java.lang.Integer => Some(Left(BigDecimal(n.intValue)))
    case n: java.lang.Long => Some(Left(BigDecimal(n.longValue)))
    case n: java.lang.Double => Some(Left(BigDecimal(n.doubleValue)))
    case n: java.lang.Float => Some(Left(BigDecimal(n.floatValue.toDouble)))
    case d: java.time.LocalDate => Some(Left(BigDecimal(d.toEpochDay)))
    case d: java.sql.Date => Some(Left(BigDecimal(d.toLocalDate.toEpochDay)))
    case t: java.time.Instant =>
      Some(Left(BigDecimal(t.getEpochSecond) * 1000000 +
        BigDecimal(t.getNano / 1000)))
    case t: java.sql.Timestamp => // scanned aggregates (java8 API off)
      Some(Left(BigDecimal(t.getTime) * 1000 +
        BigDecimal((t.getNanos / 1000) % 1000)))
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ scan aggregates
      Some(Left(
        BigDecimal(t.toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000 +
          BigDecimal(t.getNano / 1000)))
    case b: Binary => Some(Right(b.toStringUsingUTF8))
    case s: String => Some(Right(s))
    case _ => None
  }

  private def sameDomain(a: Key, b: Key): Boolean = a.isLeft == b.isLeft

  private def cmp(a: Key, b: Key): Int = (a, b) match {
    case (Left(x), Left(y)) => x.compare(y)
    // UNSIGNED UTF-8 byte order, matching parquet's string min/max
    // (and Spark's binary string comparisons) — Java's UTF-16
    // String.compareTo disagrees beyond the BMP (a supplementary
    // character's surrogate 0xD800 sorts BELOW U+E000 in UTF-16 but
    // ABOVE it in UTF-8 bytes), and a wrong order here PRUNES a file
    // that holds matching rows
    case (Right(x), Right(y)) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case _ => 0
  }
}
