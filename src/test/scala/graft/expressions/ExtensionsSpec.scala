package graft.expressions

import graft.functions.Hashing

/** Pins the SparkSessionExtensions registration path: the shared test
  * session is built with `spark.sql.extensions=graft.expressions.
  * GraftExtensions` (SparkSpec) — exactly how a deployed cluster loads
  * the library — so the custom Catalyst expressions must resolve from
  * plain SQL text, codegen'd, with sane analysis errors. */
class ExtensionsSpec extends graft.SparkSuite {
  import spark.implicits._

  test("graft_polyhash resolves from SQL and matches the Scala kernel") {
    val got = spark.sql("SELECT graft_polyhash('alpha beta') AS h")
      .collect().head.getLong(0)
    assert(got == Hashing.polyHash("alpha beta"))
    // through a table scan (codegen path), not just a literal fold
    val docs = Seq("x", "alpha beta", "").toDF("t")
    docs.createOrReplaceTempView("ext_docs")
    val rows = spark.sql("SELECT t, graft_polyhash(t) AS h FROM ext_docs")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("alpha beta") == Hashing.polyHash("alpha beta"))
    assert(rows("") == 0L)
  }

  test("graft_dot_e6 resolves from SQL with array<double> inputs") {
    val got = spark.sql(
      "SELECT graft_dot_e6(array(0.5D, 0.5D), array(1.0D, 0.25D)) AS d")
      .collect().head.getLong(0)
    assert(got == math.floor((0.5 * 1.0 + 0.5 * 0.25) * 1e6).toLong)
  }

  test("type mismatch surfaces as an analysis error, not a runtime crash") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_polyhash(42)").collect()
    }
    assert(e.getMessage.contains("graft_polyhash"), e.getMessage)
  }

  test("null inputs propagate as SQL null") {
    val r = spark.sql(
      "SELECT graft_polyhash(CAST(NULL AS STRING)) AS a," +
        " graft_dot_e6(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS b")
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("governance TVFs: graft_table / graft_as_of / graft_history resolve from SQL to the pinned plans") {
    val table = "graft_ext_tvf"
    try {
      graft.sources.Bucketed.save(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table, Seq("k"), 2)
      graft.sources.Bucketed.setRetention(spark, table, 4)
      graft.sources.Bucketed.save(Seq((3L, "c")).toDF("k", "v"),
        table, Seq("k"), 2, mode = org.apache.spark.sql.SaveMode.Append)
      // head snapshot and a pinned generation, from plain SQL
      assert(spark.sql(s"SELECT count(*) AS n FROM graft_table('$table')")
        .collect().head.getLong(0) == 3)
      assert(spark.sql(s"SELECT count(*) AS n FROM graft_as_of('$table', 1)")
        .collect().head.getLong(0) == 2)
      // the TVF is the manifest-pinned relation, not a dir scan: a
      // filter over it pushes down into the parquet scan
      val df = spark.sql(
        s"SELECT v FROM graft_table('$table') WHERE k = 2")
      assert(df.collect().map(_.getString(0)).toSeq == Seq("b"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,2"),
        s"filter must reach the scan:\n$plan")
      // history from SQL, same rows as the Scala API
      val h = spark.sql(s"SELECT generation, op FROM " +
        s"graft_history('$table') ORDER BY generation")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(h == Seq((1L, "create"), (2L, "append")), s"got $h")
      // CDC from SQL: the g1→g2 delta is exactly the appended row
      val ch = spark.sql(s"SELECT change, k FROM " +
        s"graft_changes('$table', 1, 2) ORDER BY change, k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(ch == Seq(("insert", 3L)), s"got $ch")
      // plans are built at analysis time: non-literal args error
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft_as_of('$table', 1 + 1)")
      }
      assert(e.getMessage.contains("graft_as_of"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
