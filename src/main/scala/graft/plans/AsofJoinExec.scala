package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of join: partition-local merge of two (keys, ts)-sorted
  * streams.
  *
  * Scale contract:
  *  - `requiredChildDistribution` = ClusteredDistribution(keys) per
  *    child → EnsureRequirements co-partitions the sides with at most
  *    one hash exchange each (zero for a side already partitioned on
  *    the keys), identical to SortMergeJoinExec's contract;
  *  - `requiredChildOrdering` = (keys, ts[, tieBreak]) ascending →
  *    partition-local sorts, no global sort;
  *  - the merge holds ONE buffered right row and ONE matched payload
  *    row per task — memory O(1) beyond the sorts regardless of rows
  *    per key, and each side is read exactly once;
  *  - `outputPartitioning` = left child's partitioning (every output
  *    row IS a left row), so downstream key-clustered operators plan
  *    without a new exchange; `outputOrdering` = left child's (keys,
  *    ts) order survives the merge.
  *
  * Matching: the cursor consumes right rows while their (key, ts) ≤
  * the current left row's, remembering the last consumed same-key row
  * — because both streams ascend, the remembered row is exactly the
  * most recent `r.ts <= l.ts`, and right rows ordered (ts, tieBreak)
  * make "last consumed" resolve equal-ts ties to the highest tieBreak.
  * Right null-ts rows are consumed but never remembered (null-false
  * comparison; they sort first so the cursor cannot stall on them).
  * Left null-ts rows emit a null payload without moving the cursor. */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    payload: Seq[Attribute], tieBreak: Seq[Expression],
    payloadOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTs) ++ tieBreak).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTsE = leftTs; val rTsE = rightTs
    val pay = payload
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsE), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsE), rOut)
      // codegen'd comparators over the projected key/ts rows — the
      // interpreted RowOrdering boxes every field per compare, which
      // measured ~4x slower end-to-end on a 12.8M-row merge
      val keyAttrs = lKeys.zipWithIndex.map { case (k, i) =>
        AttributeReference(s"k$i", k.dataType, nullable = true)() }
      val keyOrd = GenerateOrdering.generate(
        keyAttrs.map(SortOrder(_, Ascending)), keyAttrs)
      val tsAttr = AttributeReference("ts", lTsE.dataType, nullable = true)() :: Nil
      val tsOrd = GenerateOrdering.generate(
        tsAttr.map(SortOrder(_, Ascending)), tsAttr)
      // right input schema nullability forced true: an unmatched left
      // row projects from the all-null right row, and BindReferences
      // takes nullability from the INPUT attribute — a non-nullable one
      // would codegen without the null check (the outer-join convention)
      val resultProj = UnsafeProjection.create(
        lOut ++ pay, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight: InternalRow = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one-row right lookahead; projections reuse buffers, so the
        // buffered row and its derived key/ts are copied once on read
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTs: UnsafeRow = _
        // last same-key right row with ts <= the left cursor's ts;
        // rHead was already a private copy, so no second copy needed
        private var matched: InternalRow = _
        private var matchedKey: UnsafeRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKeyProj(rHead).copy()
            rHeadTs = rTsProj(rHead).copy()
          } else { rHead = null; rHeadKey = null; rHeadTs = null }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTs = lTsProj(l)
          val lTsNull = lTs.isNullAt(0)
          if (!lTsNull) {
            var continue = rHead != null
            while (continue) {
              val c = keyOrd.compare(rHeadKey, lKey)
              if (c < 0) advanceRight()
              else if (c == 0 &&
                  (rHeadTs.isNullAt(0) || tsOrd.compare(rHeadTs, lTs) <= 0)) {
                if (!rHeadTs.isNullAt(0)) { matched = rHead; matchedKey = rHeadKey }
                advanceRight()
              } else continue = false
              if (rHead == null) continue = false
            }
          }
          val m =
            if (!lTsNull && matched != null && keyOrd.compare(matchedKey, lKey) == 0) {
              numMatched += 1
              matched
            } else nullRight
          numOutput += 1
          resultProj(joined(l, m))
        }
      }
    }
  }
}
