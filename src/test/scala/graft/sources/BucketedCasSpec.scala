package graft.sources

import graft.SparkSuite

/** Cross-process maintenance exclusion, ENFORCED through the
  * generation manifest's own optimistic CAS: a maintenance commit
  * targets exactly its read-set generation + 1, so a foreign
  * maintenance writer that commits between an op's read and its
  * commit makes the op abort LOUDLY (old/winner generation intact,
  * staged files reconcilable) instead of silently committing a stale
  * read-modify-write that re-lists rows the winner removed. Plain
  * appends stay exempt (commutative set-unions) but flag foreign
  * generations for any in-flight maintenance op. */
class BucketedCasSpec extends SparkSuite {
  import spark.implicits._

  private def mk(table: String, n: Int): Seq[(String, Long)] = {
    val rows = (0 until n).map(i => (s"k${i % 7}", i.toLong))
    rows.toDF("bkey", "doc").createOrReplaceTempView(s"${table}_rows")
    Bucketed.save(spark.table(s"${table}_rows"), table, Seq("bkey"), 4)
    rows
  }

  test("a foreign commit between read and commit makes the maintenance op abort; winner's generation served") {
    val table = "graft_cas_lose"
    try {
      val rows = mk(table, 60)
      val before = Bucketed.currentGeneration(spark, table)
      val ex = intercept[Bucketed.ConcurrentMaintenanceException] {
        Bucketed.rewriteAll(spark, table, df => {
          // simulates a SECOND PROCESS committing a maintenance
          // generation while this op is mid-flight (between its
          // read-set snapshot and its commit)
          Bucketed.plantForeignCommit(spark, table)
          df.filter("doc < 10") // the stale rewrite that must NOT land
        })
      }
      assert(ex.getMessage.contains("concurrent maintenance writer"))
      // the loser aborted: the table serves the winner's (planted)
      // generation, with the loser's rewrite nowhere in it
      assert(Bucketed.currentGeneration(spark, table) == before + 1)
      assert(Bucketed.load(spark, table).as[(String, Long)].collect().toSet
        == rows.toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("an in-process append DURING a maintenance op advances the expectation instead of aborting it") {
    val table = "graft_cas_append_ok"
    try {
      val rows = mk(table, 40)
      val extra = (1000 until 1010).map(i => (s"k${i % 7}", i.toLong))
      val n = Bucketed.rewriteAll(spark, table, df => {
        // a concurrent ingest commit from THIS process mid-op: its
        // generation is ours (lastSeenGen advances under the manifest
        // lock), so the CAS must not mistake it for a foreign writer
        Bucketed.save(extra.toDF("bkey", "doc"), table, Seq("bkey"), 4,
          mode = org.apache.spark.sql.SaveMode.Append)
        df.filter("doc >= 10")
      })
      assert(n > 0)
      // rewrite applied to the read set, append's rows preserved
      assert(Bucketed.load(spark, table).as[(String, Long)].collect().toSet
        == (rows.filter(_._2 >= 10) ++ extra).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("a foreign commit HIDDEN under a subsequent in-process append still aborts the maintenance op") {
    val table = "graft_cas_hidden"
    try {
      val rows = mk(table, 30)
      val extra = (500 until 508).map(i => (s"k${i % 7}", i.toLong))
      intercept[Bucketed.ConcurrentMaintenanceException] {
        Bucketed.rewriteAll(spark, table, df => {
          Bucketed.plantForeignCommit(spark, table)
          // the append commits OVER the foreign generation (legal for
          // a set-union) — the on-disk max is now a generation this
          // process wrote, so only the foreign-observation counter
          // can still expose the race
          Bucketed.save(extra.toDF("bkey", "doc"), table, Seq("bkey"), 4,
            mode = org.apache.spark.sql.SaveMode.Append)
          df.limit(1)
        })
      }
      // winner generation + the append both intact, stale rewrite absent
      assert(Bucketed.load(spark, table).as[(String, Long)].collect().toSet
        == (rows ++ extra).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("listing-lag backstop: the pinned-generation create refuses an existing target") {
    val table = "graft_cas_backstop"
    try {
      mk(table, 20)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gen = Bucketed.plantForeignCommit(spark, table)
      // a racer whose dir LISTING lagged the winner's create would
      // pin the same generation — the overwrite=false create is the
      // last line of defense and must abort, not overwrite
      intercept[Bucketed.ConcurrentMaintenanceException] {
        Bucketed.writeNextManifest(fs, loc, Set.empty,
          pinnedGen = Some(gen))
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("after a CAS abort the next maintenance op (fresh read set) succeeds") {
    val table = "graft_cas_retry"
    try {
      val rows = mk(table, 50)
      intercept[Bucketed.ConcurrentMaintenanceException] {
        Bucketed.rewriteAll(spark, table, df => {
          Bucketed.plantForeignCommit(spark, table); df
        })
      }
      // the retry reads the winner's generation — clean CAS, applies
      val n = Bucketed.rewriteAll(spark, table, df => df.filter("doc < 25"))
      assert(n > 0)
      assert(Bucketed.load(spark, table).as[(String, Long)].collect().toSet
        == rows.filter(_._2 < 25).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
