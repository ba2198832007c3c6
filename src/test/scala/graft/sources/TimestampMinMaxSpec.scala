package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Timestamp-domain minMaxWhere: an NTZ (micros) column's boundary
  * files must win over the proven interior bounds — the scan
  * aggregate comes back as LocalDateTime and has to land in the same
  * comparison domain as the footer's INT64 micros. An LTZ column
  * written as INT96 has no usable footer stats, so everything scans —
  * conservative, still exact. */
class TimestampMinMaxSpec extends SparkSuite {
  import spark.implicits._

  test("NTZ timestamps: boundary scan beats proven interior bounds") {
    val table = "graft_ts_minmax"
    try {
      // NTZ column via to_timestamp_ntz of a date string — each append
      // covers a disjoint day range, like a time-ordered ingest
      def slice(lo: Int, hi: Int) =
        (lo until hi).map(i => (i.toLong, f"1995-01-01"))
          .toDF("k", "base")
          .select(col("k"),
            (to_timestamp_ntz(col("base")) +
              make_dt_interval(col("k").cast("int"))).as("d"))
      Bucketed.save(slice(0, 100), table, Seq("k"), 2)
      Bucketed.save(slice(100, 200), table, Seq("k"), 2,
        mode = org.apache.spark.sql.SaveMode.Append)
      Bucketed.save(slice(200, 300), table, Seq("k"), 2,
        mode = org.apache.spark.sql.SaveMode.Append)
      val base = java.time.Instant.parse("1995-01-01T00:00:00Z")
      val lo = base.plusSeconds(50L * 86400)
      val hi = base.plusSeconds(250L * 86400)
      val (mn, mx) = FileStats.minMaxWhere(spark, table, "d", lo, hi)
      // the true extrema sit in the BOUNDARY slices (days 50 and 250),
      // outside the fully-covered middle slice's [100, 200) span
      def micros(v: Any): Long = v match {
        case t: java.time.LocalDateTime =>
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
        case t: java.time.Instant =>
          t.getEpochSecond * 1000000L
        case t: java.sql.Timestamp => t.getTime * 1000L
      }
      assert(mn.map(micros).contains(lo.getEpochSecond * 1000000L),
        s"min must come from the boundary scan: $mn")
      assert(mx.map(micros).contains(hi.getEpochSecond * 1000000L),
        s"max must come from the boundary scan: $mx")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
