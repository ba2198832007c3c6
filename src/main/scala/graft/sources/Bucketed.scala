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
           buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
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
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def load(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
