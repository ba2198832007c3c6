package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Schema evolution on the bucketed contract: addColumn touches no
  * data file (old rows null-fill on every read path — hot load, time
  * travel across the change, merge's touched-bucket read), appends
  * and merges carry the new column, and a merge backfills old rows
  * group-wise. */
class BucketedEvolutionSpec extends SparkSuite {
  import spark.implicits._

  private def stateOf(table: String): Set[(Long, Long, Option[String])] =
    Bucketed.load(spark, table).select("k", "v", "note")
      .as[(Long, Long, Option[String])].collect().toSet

  test("addColumn null-fills old files; appends and merges carry the new column") {
    val table = "graft_evo_basic"
    try {
      Bucketed.save((0 until 20).map(i => (i.toLong, i.toLong * 2))
        .toDF("k", "v"), table, Seq("k"), 4)
      Bucketed.setRetention(spark, table, 4)
      val g0 = Bucketed.currentGeneration(spark, table)
      Bucketed.addColumn(spark, table, "note", "STRING")
      // old files untouched, every row reads null
      assert(stateOf(table) ==
        (0 until 20).map(i => (i.toLong, i.toLong * 2, None)).toSet)
      // an append carries the column
      Bucketed.save(Seq((100L, 1L, "new")).toDF("k", "v", "note"),
        table, Seq("k"), 4, mode = org.apache.spark.sql.SaveMode.Append)
      // a merge backfills old keys group-wise (its touched-bucket read
      // null-fills the pre-evolution files)
      Bucketed.mergeByKey(spark, table,
        Seq((3L, 6L, "backfilled")).toDF("k", "v", "note"))
      val st = stateOf(table)
      assert(st.contains((100L, 1L, Some("new"))))
      assert(st.contains((3L, 6L, Some("backfilled"))))
      assert(st.contains((4L, 8L, None)))
      // time travel ACROSS the evolution reads the old generation
      // under the current schema (null-filled), not a schema error
      assert(Bucketed.loadAsOf(spark, table, g0)
        .select("k", "v", "note")
        .as[(Long, Long, Option[String])].collect().toSet ==
        (0 until 20).map(i => (i.toLong, i.toLong * 2, None)).toSet)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
