package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the zero-shuffle co-located join path the
  * scale notes promise (e.g. Relational.reconcile: "pre-bucket both
  * manifests by key to make this a zero-shuffle sort-merge join").
  *
  * Writing both sides of a recurring join bucketed+sorted on the join
  * key lets Catalyst plan a sort-merge join with NO Exchange and NO
  * per-query Sort on either side: at 100 TB this converts every
  * manifest-vs-manifest reconcile, listing anti-join, or triple-store
  * self-join from a full shuffle of both inputs into a partition-local
  * merge. The write pays one shuffle ONCE; every subsequent join is
  * shuffle-free (asserted in BucketedSpec against the physical plan).
  *
  * CONCURRENCY CONTRACT (single maintenance writer): the rewrite-based
  * maintenance ops — [[compactBuckets]], [[rewriteBuckets]], and their
  * callers (index deletion, codebook reassignment) — are individually
  * crash-safe (visible-first swap) but NOT safe to run concurrently
  * with each other on one table: two overlapping rewrites each read
  * the pre-op file set, so the second swap can resurrect rows the
  * first removed (a compaction racing a delete would silently undo the
  * erasure). A per-table in-process lock makes the mistake loud: a
  * second concurrent maintenance op in the same driver fails fast
  * instead of corrupting. The lock is deliberately NOT a lock FILE: a
  * file survives a crashed writer, and a stale lock would brick the
  * gates' documented self-healing replay (streamNovel re-runs its
  * inline compaction after a crash — with a leftover file it would
  * fail forever instead of healing); the in-process lock dies with
  * the JVM that held it, exactly when its op does. CROSS-PROCESS
  * exclusion is the deployment's contract — one maintenance owner per
  * index, the same assumption Spark's own non-transactional tables
  * make — and is documented rather than half-enforced. Plain [[save]]
  * appends are NOT lock-guarded: an append lands a fresh file the
  * in-flight rewrite never read and never deletes, so
  * append-during-maintenance is safe; ordering an append against a
  * delete of the SAME keys is the caller's pipeline contract.
  */
object Bucketed {

  /** Save `df` as a bucketed, sorted managed table (default database).
    * `buckets` should be sized so a bucket of the LARGER recurring join
    * side fits an executor core's working set.
    *
    * A previous SESSION's managed-table location can survive in the
    * warehouse dir while the (in-memory) catalog entry did not —
    * SaveMode.Overwrite only clears locations the catalog knows about,
    * and Spark refuses to adopt an orphaned one
    * (LOCATION_ALREADY_EXISTS). Drop + clear explicitly first. */
  def save(df: DataFrame, table: String, keys: Seq[String],
           buckets: Int, mode: SaveMode = SaveMode.Overwrite,
           sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // destructive pre-clear ONLY under Overwrite — Append/Ignore/
    // ErrorIfExists must keep their SaveMode contracts
    if (mode == SaveMode.Overwrite) {
      // qualified names: quote each part separately (one backtick pair
      // around `db.tbl` makes it a single identifier) and resolve the
      // orphan location from the DATABASE's catalog location — the
      // string-derived `<warehouse>/<table>` is wrong for any
      // non-default database (`<warehouse>/<db>.db/<tbl>`) or a
      // database created with a custom LOCATION
      val parts = table.split('.')
      require(parts.length <= 2 && parts.forall(p => p.nonEmpty && !p.contains("`")),
        s"expected an unqualified or db-qualified table name, got: $table")
      spark.sql(s"DROP TABLE IF EXISTS ${parts.map(p => s"`$p`").mkString(".")}")
      val (db, tbl) =
        if (parts.length == 2) (parts(0), parts(1))
        else (spark.catalog.currentDatabase, parts(0))
      if (spark.catalog.databaseExists(db)) {
        val loc = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(
            spark.catalog.getDatabase(db).locationUri),
          tbl.toLowerCase(java.util.Locale.ROOT))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
    }
    val sort = if (sortCols.nonEmpty) sortCols else keys
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sort.head, sort.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Rewrite every bucket whose file count exceeds `maxFilesPerBucket`
    * into ONE sorted file, preserving the table's bucket spec — the
    * maintenance half of the append-per-batch contract. Each
    * [[save]](Append) adds ≥1 file per touched bucket, so an index a
    * gate runs FOREVER against grows O(batches) files per bucket:
    * listing cost, parquet footer reads, and row-group min/max
    * skipping all degrade linearly with batch count even when the scan
    * bucket-prunes. Compaction restores one-file-per-bucket, which
    * also makes the whole bucket one contiguous sorted run again (the
    * "sorted on the key" skip property holds per FILE, so it weakens
    * as files accumulate and is fully restored here).
    *
    * Mechanics: bucket membership is carried in the FILE NAME
    * (`..._<bucketId>.ext` — how Spark's bucketed scan groups files),
    * so each oversized bucket is rewritten by reading just its files,
    * deduplicating if requested, sorting by the table's sort columns,
    * and swapping in a single correctly-named file. The swap makes the
    * compacted file visible BEFORE deleting the originals: a crash
    * mid-compaction therefore leaves duplicate rows, never missing
    * ones — the safe side for the callers (a missing band/posting row
    * would silently pass a duplicate document through the novel-docs
    * gate; duplicates change no gate verdict and are removed by the
    * next compaction pass). `dedupRows` defaults true because both
    * index layouts are SETS of posting rows — (bkey, doc) bands and
    * (centroid, id, vn) inverted lists — where duplicates (from
    * at-least-once batch replay or a prior interrupted compaction) are
    * semantically idle for the dedup gate but would double-count a
    * neighbor in the ANN probe's top-k window.
    *
    * Runs as ONE job over only the oversized buckets' files: their
    * rows are re-bucketed through a staging table written with the
    * SAME bucket spec (the writer computes each row's bucket id from
    * the bucket columns, so file↔bucket assignment is Spark's own, not
    * re-derived here), pre-partitioned on the bucket key so each
    * bucket lands in exactly one task and therefore one file. A
    * 4096-bucket index where only the 30 buckets touched since the
    * last pass are oversized reads and rewrites 30 buckets' files in
    * one 30-task wave — per-bucket selectivity AND full cluster
    * parallelism, no per-bucket driver-looped jobs.
    *
    * Filesystem caveat: the swap is a driver-side rename-then-delete
    * loop — atomic and cheap per file on HDFS/local, but a COPY on
    * S3-style object stores (rename is not native there). A real
    * object-store deployment puts the index behind a manifest-backed
    * table format where compaction is a metadata swap; this
    * implementation targets the HDFS-semantics filesystems Spark's
    * own bucketed tables assume. Returns the number of buckets
    * rewritten. */
  def compactBuckets(spark: SparkSession, table: String,
                     maxFilesPerBucket: Int = 4,
                     dedupRows: Boolean = true): Int =
    rewriteCore(spark, table,
      select = _.length > maxFilesPerBucket, bucketIds = None,
      transform = df => if (dedupRows) df.dropDuplicates() else df)

  /** Rewrite EXACTLY the given buckets' rows through `transform`
    * (rows of other buckets are never read or touched), preserving the
    * bucket spec and sort — the primitive behind bounded-cost DELETEs
    * on a bucketed index: a caller that knows which buckets hold the
    * affected keys (the bucket function is `pmod(hash(key), n)` —
    * Spark's own `HashPartitioning.partitionIdExpression`) pays
    * O(those buckets), not O(table). Same one-job staging +
    * visible-first swap as [[compactBuckets]]; `transform` MUST be
    * idempotent and duplicate-tolerant (compose with dropDuplicates
    * for posting sets) because a crash between the swap-in and the
    * old-file deletes leaves both generations visible until the
    * caller re-runs. Returns the number of buckets rewritten. */
  def rewriteBuckets(spark: SparkSession, table: String,
                     bucketIds: Set[Int],
                     transform: DataFrame => DataFrame): Int =
    if (bucketIds.isEmpty) 0
    else rewriteCore(spark, table, select = _ => true,
      bucketIds = Some(bucketIds), transform = transform)

  /** Rewrite the WHOLE table's rows through `transform` in one job,
    * preserving the bucket spec — the full-table maintenance primitive
    * (e.g. re-keying every posting after an ANN codebook refresh,
    * where the bucket-key VALUES change and rows migrate buckets). The
    * transform may rewrite the bucket column itself: the staging write
    * re-derives each row's bucket from the transformed values, so the
    * swap lands every row in its correct new bucket file. Same
    * one-job staging + visible-first swap + maintenance lock as
    * [[compactBuckets]]; `transform` MUST be idempotent and
    * duplicate-tolerant. Returns the number of buckets read. */
  def rewriteAll(spark: SparkSession, table: String,
                 transform: DataFrame => DataFrame): Int =
    rewriteCore(spark, table, select = _ => true, bucketIds = None,
      transform = transform)

  private def rewriteCore(spark: SparkSession, table: String,
                          select: Seq[org.apache.hadoop.fs.FileStatus] => Boolean,
                          bucketIds: Option[Set[Int]],
                          transform: DataFrame => DataFrame): Int = {
    import org.apache.hadoop.fs.Path
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = spark.sessionState.catalog.getTableMetadata(ident)
    require(meta.bucketSpec.isDefined, s"$table is not bucketed")
    val dir = new Path(meta.location)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // single-maintenance-writer guard (see the object scaladoc):
    // acquired before the file listing — the listing is part of the
    // read-modify-write a concurrent rewrite would corrupt. Keyed on
    // the resolved location, not the name, so db-qualified aliases of
    // one table contend on one lock.
    val lock = maintenanceLockFor(dir.toString)
    if (!lock.tryLock()) throw new IllegalStateException(
      s"maintenance already in flight on $table — compaction, deletion " +
        "and reassignment are single-writer ops; retry after the " +
        "running op finishes")
    try rewriteLocked(spark, table, meta, dir, fs, select, bucketIds,
      transform)
    finally lock.unlock()
  }

  /** Per-table-location maintenance locks (see the object scaladoc:
    * in-process by design — a crashed holder's lock must die with it).
    * Entries are never removed: safe removal would race computeIfAbsent
    * (a waiter on the removed instance vs a fresh instance for the next
    * caller = two holders on one table), and the growth is one
    * ~48-byte ReentrantLock per DISTINCT table location ever
    * maintained in this driver — bounded by the session's table count,
    * not by op count. */
  private val maintenanceLocks =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.locks.ReentrantLock]()

  /** Test hook: the lock a maintenance op on `location` would take. */
  private[sources] def maintenanceLockFor(location: String)
      : java.util.concurrent.locks.ReentrantLock =
    maintenanceLocks.computeIfAbsent(new org.apache.hadoop.fs.Path(location).toString,
      _ => new java.util.concurrent.locks.ReentrantLock())

  private def rewriteLocked(spark: SparkSession, table: String,
                            meta: org.apache.spark.sql.catalyst.catalog.CatalogTable,
                            dir: org.apache.hadoop.fs.Path,
                            fs: org.apache.hadoop.fs.FileSystem,
                            select: Seq[org.apache.hadoop.fs.FileStatus] => Boolean,
                            bucketIds: Option[Set[Int]],
                            transform: DataFrame => DataFrame): Int = {
    import org.apache.hadoop.fs.Path
    val bucketSpec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(s"$table is not bucketed"))
    // Spark's bucketed scan derives the bucket id from the trailing
    // `_<digits>` of the file name (before the extension) — group the
    // data files the same way; anything unparseable is left untouched
    val bucketIdOf: String => Option[Int] = name =>
      """.*_(\d+)(?:\..*)?$""".r.findFirstMatchIn(name).map(_.group(1).toInt)
    val dataFiles = fs.listStatus(dir).toSeq
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val chosen = dataFiles.groupBy(f => bucketIdOf(f.getPath.getName))
      .collect { case (Some(b), fsOfB)
        if bucketIds.forall(_.contains(b)) && select(fsOfB) => b -> fsOfB }
    if (chosen.isEmpty) return 0
    val oldFiles = chosen.values.flatten.toSeq
    val rows = transform(spark.read.schema(meta.schema)
      .parquet(oldFiles.map(_.getPath.toString): _*))
    val keyCols = bucketSpec.bucketColumnNames
      .map(org.apache.spark.sql.functions.col)
    val staging = s"${table}__rewrite"
    save(rows.repartition(bucketSpec.numBuckets, keyCols: _*),
      staging, bucketSpec.bucketColumnNames, bucketSpec.numBuckets,
      sortCols = bucketSpec.sortColumnNames)
    try {
      val stagingDir = new Path(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(staging)).location)
      val newFiles = fs.listStatus(stagingDir).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      // visible-first swap: the rewritten files land BEFORE the
      // originals go, so a crash mid-swap leaves BOTH generations
      // visible (duplicates / not-yet-deleted rows) rather than losing
      // rows — recovered by re-running the same maintenance op
      newFiles.foreach { f =>
        val target = new Path(dir, f.getPath.getName)
        require(fs.rename(f.getPath, target), s"rename to $target failed")
      }
      oldFiles.foreach(f => fs.delete(f.getPath, false))
    } finally spark.sql(
      s"DROP TABLE IF EXISTS ${staging.split('.').map(p => s"`$p`").mkString(".")}")
    // drop the cached file listing so the next scan sees the new layout
    spark.catalog.refreshTable(table)
    chosen.size
  }
}
