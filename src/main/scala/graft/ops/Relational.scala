package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator shapes (SURVEY §2), generalized as
  * reusable DataFrame combinators. Each is a thin declarative composition —
  * Catalyst plans/partitions/pushes-down; these exist so pipelines share one
  * audited implementation of each semantic.
  *
  * Scale notes are per-operator; nothing here collects to the driver.
  */
object Relational {

  /** F9/J5 — "skip if exists": rows of `df` whose key is absent from
    * `existing` (razu/edepot.py:137-142 skip-upload semantics). Anti joins
    * broadcast automatically when `existing` is small; pass
    * `broadcast(existing)` to force.
    */
  def antiJoin(df: DataFrame, existing: DataFrame, joinExpr: Column): DataFrame =
    df.join(existing, joinExpr, "left_anti")

  /** F3/J6 — keep rows with at least one match (has-referenced-file
    * predicate, razu/meta_resource.py:104-106). */
  def semiJoin(df: DataFrame, other: DataFrame, joinExpr: Column): DataFrame =
    df.join(other, joinExpr, "left_semi")

  /** J4/F8 — manifest diff: rows of `current` that are new or changed vs
    * `reference` (tools/sip2localstorage.py:76-94, razu/edepot.py:87-106).
    * Left join on `key`; keep when the reference row is missing or its
    * `refHash` differs from `curHash`.
    */
  def changedOrNew(current: DataFrame, reference: DataFrame,
                   key: Column, curHash: Column, refHash: Column): DataFrame =
    current.join(reference, key, "left_outer")
      .filter(refHash.isNull || curHash =!= refHash)

  /** T3 — manifest-vs-directory reconciliation (razu/manifest.py:185-221):
    * full outer join of (key, hash) sides a/b → status column:
    * 'missing' (a only), 'extra' (b only), 'mismatch', 'ok'.
    * Shuffles both sides on the key — at 100 TB pre-bucket both manifests
    * by key to make this a zero-shuffle sort-merge join.
    */
  def reconcile(a: DataFrame, b: DataFrame, keyCol: String,
                aHash: Column, bHash: Column): DataFrame = {
    a.join(b, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(bHash.isNull && aHash.isNotNull, lit("missing"))
          .when(aHash.isNull && bHash.isNotNull, lit("extra"))
          .when(aHash =!= bHash, lit("mismatch"))
          .otherwise(lit("ok")))
  }

  /** W2 — deterministic sequential id assignment (razu/incrementer.py:1-11):
    * row_number over an explicit total order — NEVER
    * monotonically_increasing_id (not stable across partitioning).
    * Single global sort; at 100 TB assign per-partition offsets via
    * zipWithIndex-style two-pass if one total order column is too hot.
    */
  def sequentialIds(df: DataFrame, order: Seq[Column],
                    idCol: String = "seq_id", offset: Long = 0L): DataFrame =
    df.withColumn(idCol,
      row_number().over(Window.orderBy(order: _*)).cast("long") + offset)

  /** W1 — ordered group-break detection (serie breaks,
    * csv2rdf.py:90-114): flag rows where `groupCol` differs from its
    * predecessor in `order` within `partition`.
    */
  def groupBreaks(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                  groupCol: Column, flag: String = "is_break"): DataFrame = {
    val w =
      if (partition.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(flag,
      coalesce(groupCol =!= lag(groupCol, 1).over(w), lit(true)))
  }

  /** A7 — set-semantics dedup of a triple-shaped (or any) DataFrame
    * (rdflib Graph.add idempotency, razu/rdf_resource.py:25-31). */
  def distinctRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** O4-style keep-first: one surviving row per key, chosen by `order`
    * (exact-dedup keep-first; also the backbone of A8 group-to-one).
    * Shuffle on key, no global sort.
    */
  def keepFirst(df: DataFrame, key: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key: _*).orderBy(order: _*)))
      .filter(col("__rn") === 1).drop("__rn")
}
