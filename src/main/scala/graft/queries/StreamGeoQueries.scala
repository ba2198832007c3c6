package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.streaming.Streaming

/** Structured-Streaming and geo queries with DuckDB oracles. */
object StreamGeoQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Structured Streaming windowed aggregation, run to completion with
    // Trigger.AvailableNow — must equal the BATCH q30 oracle exactly
    // (streaming/batch parity is the correctness claim)
    "q37_stream_windowed" -> ((s, dir) => {
      val name = s"q37_mem_${System.nanoTime()}"
      Streaming.runAvailableNow(
          Streaming.windowedAgg(Streaming.eventStream(s, s"$dir/events.parquet")),
          name)
        .orderBy("window_start", "event_type")
    }),

    // G1/G2/G3 — RD-coordinate parse + polynomial CRS transform,
    // quantized to 1e6 microdegrees (multiplication-chain arithmetic is
    // replicated verbatim in the oracle)
    "q38_geo_transform" -> ((s, dir) => {
      val o = graft.sources.Tables.table(s, dir, "orders")
        .withColumn("coord", format_string("X %d Y %d",
          (lit(100000000L) + pmod(col("o_orderkey"), lit(100000)) * 1000),
          (lit(430000000L) + pmod(col("o_orderkey"), lit(170000)) * 1000)))
      val p = Geo.parseRdCoordCol(col("coord"))
      o.select(col("o_orderkey"), col("coord"))
        .withColumn("lat_e6",
          floor(Geo.latCol(p("x"), p("y")) * 1000000.0).cast("long"))
        .withColumn("lon_e6",
          floor(Geo.lonCol(p("x"), p("y")) * 1000000.0).cast("long"))
        .orderBy("o_orderkey")
    }))

  val oracles: Map[String, String] = Map(
    "q37_stream_windowed" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q38_geo_transform" -> {
      val x = "(CAST(100000000 + (o_orderkey % 100000) * 1000 AS BIGINT) / 1000.0)"
      val y = "(CAST(430000000 + (o_orderkey % 170000) * 1000 AS BIGINT) / 1000.0)"
      s"""SELECT o_orderkey,
         |  'X ' || CAST(100000000 + (o_orderkey % 100000) * 1000 AS VARCHAR) ||
         |  ' Y ' || CAST(430000000 + (o_orderkey % 170000) * 1000 AS VARCHAR) AS coord,
         |  CAST(floor(${Geo.latSql(x, y)} * 1000000.0) AS BIGINT) AS lat_e6,
         |  CAST(floor(${Geo.lonSql(x, y)} * 1000000.0) AS BIGINT) AS lon_e6
         |FROM orders ORDER BY o_orderkey""".stripMargin
    })
}
