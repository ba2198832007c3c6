package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Bloom-filter file skipping for equality lookups: on a
  * high-cardinality unclustered column min/max cannot prune (every
  * file spans the whole range), parquet blooms written through
  * Bucketed.save's writeOptions can — and maintenance rewrites keep
  * them, because the options persist as table properties and the
  * staging write re-applies them. */
class BloomLookupSpec extends SparkSuite {
  import spark.implicits._

  private val bloomOpts = Map(
    "parquet.bloom.filter.enabled#u" -> "true",
    "parquet.bloom.filter.expected.ndv#u" -> "1000")

  // md5 strings span the whole lexicographic range in every file —
  // min/max provably cannot prune this column
  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"u${i}x"))
      .toDF("k", "raw")
      .select(col("k"), md5(col("raw")).as("u"))

  private def uOf(k: Long, table: String): String =
    Bucketed.load(spark, table).filter(col("k") === k)
      .select("u").as[String].head()

  test("bloom prunes files min/max cannot; lookup result exact; merge keeps the blooms") {
    val table = "graft_bloom_lookup"
    try {
      Bucketed.save(rows(0, 200), table, Seq("k"), 4,
        writeOptions = bloomOpts)
      Bucketed.save(rows(200, 400), table, Seq("k"), 4,
        mode = org.apache.spark.sql.SaveMode.Append,
        writeOptions = bloomOpts)
      Bucketed.save(rows(400, 600), table, Seq("k"), 4,
        mode = org.apache.spark.sql.SaveMode.Append,
        writeOptions = bloomOpts)
      val needle = uOf(123L, table)
      // min/max keeps everything (full-range strings in every file)...
      val (keptMinMax, _) =
        FileStats.splitFiles(spark, table, "u", needle, needle)
      assert(keptMinMax.size >= 8, s"minmax should keep ~all files")
      // ...the blooms prune to (nearly) the one file holding the value
      val conf = spark.sparkContext.hadoopConfiguration
      val surviving = keptMinMax.filter(p =>
        FileStats.bloomMightContain(conf, p, "u", needle))
      assert(surviving.size < keptMinMax.size,
        s"blooms must prune: ${surviving.size} of ${keptMinMax.size}")
      assert(FileStats.loadEquals(spark, table, "u", needle)
        .select("k").as[Long].collect().toSeq == Seq(123L))
      // the write options persisted as table properties…
      val props = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
        .storage.properties
      assert(props.get("parquet.bloom.filter.enabled#u").contains("true"))
      // …so a maintenance rewrite (merge) keeps blooms on the files it
      // rewrites: the needle's bucket is rewritten, pruning still works
      Bucketed.mergeByKey(spark, table,
        rows(600, 601).select(col("k") + 10000L as "k", col("u")))
      val needle2 = uOf(124L, table)
      val (kept2, _) =
        FileStats.splitFiles(spark, table, "u", needle2, needle2)
      val surviving2 = kept2.filter(p =>
        FileStats.bloomMightContain(conf, p, "u", needle2))
      assert(surviving2.size < kept2.size,
        "blooms must survive maintenance rewrites")
      assert(FileStats.loadEquals(spark, table, "u", needle2)
        .select("k").as[Long].collect().toSeq == Seq(124L))
      // a value in NO file: blooms prune everything (modulo false
      // positives), the result is empty either way
      assert(FileStats.loadEquals(spark, table, "u", "not-a-hash")
        .count() == 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("long-column lookups hash correctly and stay exact") {
    val table = "graft_bloom_long"
    try {
      Bucketed.save(
        (0 until 300).map(i => (i.toLong, (i * 7919L) % 100000L))
          .toDF("k", "code"),
        table, Seq("k"), 4,
        writeOptions = Map("parquet.bloom.filter.enabled#code" -> "true",
          "parquet.bloom.filter.expected.ndv#code" -> "1000"))
      val got = FileStats.loadEquals(spark, table, "code",
          (123L * 7919L) % 100000L)
        .select("k").as[Long].collect().toSet
      val want = Bucketed.load(spark, table)
        .filter(col("code") === (123L * 7919L) % 100000L)
        .select("k").as[Long].collect().toSet
      assert(got == want && got.contains(123L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
