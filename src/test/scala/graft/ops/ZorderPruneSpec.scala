package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.sources.FileStats

/** Z-order clustering × file-level data skipping: a table written
  * through saveClustered prunes files on a range over EITHER
  * dimension (the whole point of the Morton layout — a 1-D sort would
  * prune on one), and the pruned reads return exactly the full-scan
  * rows. */
class ZorderPruneSpec extends SparkSuite {
  import spark.implicits._

  test("clustered layout prunes on both dimensions, results identical to full scan") {
    val table = "graft_zorder_prune"
    try {
      // 100×100 grid — every (x, y) pair once
      val grid = (0 until 100).flatMap(x => (0 until 100).map(y =>
        (x.toLong, y.toLong, (x * 100 + y).toLong))).toDF("x", "y", "id")
      Layout.saveClustered(grid, table, "x", "y", numFiles = 16)
      // a narrow x-range must prune files (each file covers a compact
      // Morton square, not an x-stripe)
      val (keptX, prunedX) = FileStats.splitFiles(spark, table, "x", 10L, 19L)
      assert(prunedX.nonEmpty && keptX.nonEmpty,
        s"x-range must prune: kept=${keptX.size} pruned=${prunedX.size}")
      val gotX = FileStats.loadBetween(spark, table, "x", 10L, 19L)
        .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      val wantX = spark.table(table).filter(col("x").between(10, 19))
        .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      assert(gotX == wantX && gotX._1 == 1000L)
      // and the SAME layout prunes on y too
      val (keptY, prunedY) = FileStats.splitFiles(spark, table, "y", 80L, 89L)
      assert(prunedY.nonEmpty && keptY.nonEmpty,
        s"y-range must prune: kept=${keptY.size} pruned=${prunedY.size}")
      val gotY = FileStats.loadBetween(spark, table, "y", 80L, 89L)
        .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      val wantY = spark.table(table).filter(col("y").between(80, 89))
        .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      assert(gotY == wantY && gotY._1 == 1000L)
      // the conjunctive 2-D box prunes to the INTERSECTION of the two
      // kept sets — never more files than either 1-D range — and the
      // result still equals the plain conjunctive filter
      val boxKept = keptX.map(_.toString).toSet
        .intersect(keptY.map(_.toString).toSet)
      assert(boxKept.size <= math.min(keptX.size, keptY.size))
      val gotBox = FileStats.loadWhere(spark, table,
          Seq(("x", 10L, 19L), ("y", 80L, 89L)))
        .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      val wantBox = spark.table(table)
        .filter(col("x").between(10, 19) && col("y").between(80, 89))
        .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
      assert(gotBox == wantBox && gotBox._1 == 100L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
