package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CurationQueries, PipelineQueries, RdfQueries, RelationalQueries, SimQueries, StreamGeoQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every registered operator query (SURVEY §2 IDs in
  * each module's scaladoc); `oracleSql` carries the DuckDB-equivalent ANSI
  * SQL for the driver's hash-compare. Queries with no closed-form SQL
  * oracle (e.g. q28 LSH ANN) are intentionally absent from `oracleSql` —
  * the driver records a rows-only check and the scalatest suite carries the
  * stronger guarantee (recall vs brute force).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the E1-style CSV→RDF pipeline shape over the testdata star
    * schema: scan → broadcast vocab join (J1) → equi-join (J2) → struct
    * build (M1) → triple flatten (X3) → dedup (A7). Returns the triple DF.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.etl.Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      SimQueries.queries ++ PipelineQueries.queries ++ RdfQueries.queries ++
      StreamGeoQueries.queries ++ CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++
      SimQueries.oracles ++ PipelineQueries.oracles ++ RdfQueries.oracles ++
      StreamGeoQueries.oracles ++ CurationQueries.oracles
}
