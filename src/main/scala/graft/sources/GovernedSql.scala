package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued functions over the governed-table layer — time
  * travel and history reach plain SQL the way the jsonld/turtle
  * sources do (`SparkSessionExtensions.injectTableFunction`, wired in
  * [[graft.expressions.GraftExtensions]]):
  *
  * {{{
  *   SELECT * FROM graft_table('corpus')           -- head snapshot
  *   SELECT * FROM graft_as_of('corpus', 3)        -- generation pin
  *   SELECT * FROM graft_history('corpus')         -- DESCRIBE HISTORY
  *   SELECT * FROM graft_changes('corpus', 3, 5)   -- row-level CDC
  * }}}
  *
  * Each TVF resolves AT ANALYSIS TIME to the exact plan the Scala API
  * builds — `graft_table`/`graft_as_of` return [[Bucketed.load]] /
  * [[Bucketed.loadAsOf]]'s manifest-pinned snapshot relation (the
  * bucket-spec-preserving file-list plan, NEVER a directory scan:
  * retention > 1 keeps superseded files in place, so a dir scan would
  * double-read), which means filters and projections over the TVF
  * push down into the parquet scan like any table, and joins on the
  * bucket key keep the shuffle-free bucketed plan. `graft_history`
  * resolves to the audit records as a local relation (tiny, driver-
  * side by design — the audit path, not a data path); `graft_changes`
  * resolves to [[Bucketed.diffGenerations]]' changed-files-only CDC
  * delta between two retained generations.
  *
  * Arguments must be LITERALS (table name; generation number): the
  * plan is built during analysis, before any row exists — a
  * non-literal argument is an analysis error, matching how SQL range/
  * explode TVFs treat their cardinality arguments. */
object GovernedSql {

  private def litString(args: Seq[Expression], i: Int,
                        fn: String): String = args(i) match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be a string literal (a governed " +
        s"table name), got: $other")
  }

  private def litLong(args: Seq[Expression], i: Int,
                      fn: String): Long = args(i) match {
    case Literal(l: Long, LongType) => l
    case Literal(n: Integer, IntegerType) => n.longValue
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be an integer literal (a " +
        s"generation), got: $other")
  }

  private def arity(args: Seq[Expression], n: Int, fn: String,
                    usage: String): Unit =
    if (args.size != n) throw new IllegalArgumentException(
      s"$fn takes $n argument(s): $usage; got ${args.size}")

  /** `graft_table('t')` — the head snapshot, manifest-resolved. */
  def tablePlan(args: Seq[Expression]): LogicalPlan = {
    arity(args, 1, "graft_table", "graft_table('table')")
    Bucketed.load(SparkSession.active,
      litString(args, 0, "graft_table")).queryExecution.logical
  }

  /** `graft_as_of('t', g)` — the generation-pinned snapshot
    * ([[Bucketed.loadAsOf]]'s contract: fails loudly when `g` fell
    * out of the retention window, never serves a partial state). */
  def asOfPlan(args: Seq[Expression]): LogicalPlan = {
    arity(args, 2, "graft_as_of", "graft_as_of('table', generation)")
    Bucketed.loadAsOf(SparkSession.active,
      litString(args, 0, "graft_as_of"),
      litLong(args, 1, "graft_as_of")).queryExecution.logical
  }

  /** `graft_history('t')` — the commit audit, oldest first. */
  def historyPlan(args: Seq[Expression]): LogicalPlan = {
    arity(args, 1, "graft_history", "graft_history('table')")
    Bucketed.history(SparkSession.active,
      litString(args, 0, "graft_history")).queryExecution.logical
  }

  /** `graft_changes('t', x, y)` — the row-level CDC delta between two
    * retained generations ([[Bucketed.diffGenerations]]: `change` ∈
    * insert|delete plus the table's columns, read from ONLY the files
    * the two manifests disagree on — shared files are provably
    * unchanged and never opened). */
  def changesPlan(args: Seq[Expression]): LogicalPlan = {
    arity(args, 3, "graft_changes",
      "graft_changes('table', fromGeneration, toGeneration)")
    Bucketed.diffGenerations(SparkSession.active,
      litString(args, 0, "graft_changes"),
      litLong(args, 1, "graft_changes"),
      litLong(args, 2, "graft_changes")).queryExecution.logical
  }
}
