package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.ColumnBridge

/** The full option-(c) Catalyst ladder for the as-of join: a custom
  * `LogicalPlan` node, a `SparkStrategy`, and a physical `SparkPlan`
  * executing a single-pass per-partition MERGE — the classic
  * pandas/kdb asof algorithm, distributed.
  *
  * The Dataset-level [[graft.ops.AsofJoin.asofJoin]] (union + window)
  * is the semantically complete surface (backward/forward/nearest ×
  * tolerance, gated q130–q132); this operator is the throughput path
  * for the dominant case (backward, optional tolerance): both sides
  * hash-cluster on the `by` keys and sort by (by, time) — exactly the
  * layout a sort-merge join would demand — and each partition then
  * resolves every left row with one forward scan of the right side:
  * O(n log n) in the shuffle sort, O(n) merge, and NO per-row window
  * state or union-row blowup. At 100 TB it inherits SMJ's scaling
  * story wholesale (spillable sort, AQE-sized exchanges).
  *
  * Wiring: [[graft.Engine.session]] injects [[AsofMergeJoinStrategy]]
  * via `SparkSessionExtensions.injectPlannerStrategy`;
  * [[AsofMergeJoin.install]] covers externally built sessions through
  * `experimental.extraStrategies`.
  */
object AsofMergeJoin {

  /** Backward as-of join: for each left row, the latest right row of
    * the same `by` group with rightOn <= leftOn (within `toleranceSec`
    * if given). Emits left.* plus `rightCols` (null when no match).
    * Time columns must be TimestampType (µs) or integral.
    *
    * Null semantics: a null time never matches (left gets nulls, right
    * is skipped). Null BY keys group together and match each other —
    * unlike pandas, where NaN keys never match; filter them out first
    * if pandas semantics are required.
    *
    * Duplicate (by, on) pairs on the right are resolved
    * deterministically: the physical ordering tie-breaks on the
    * projected right columns, so backward returns the greatest payload
    * tuple among the tied rows, and forward the least among
    * strictly-later ties (an exact-timestamp tie group folds like
    * backward, to its greatest). Pandas keeps the positionally-last
    * duplicate, which has no distributed analogue.
    */
  def asofBackward(left: DataFrame, right: DataFrame, leftOn: String,
      rightOn: String, by: Seq[String], rightCols: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame =
    asofMerge(left, right, leftOn, rightOn, by, rightCols, "backward",
      toleranceSec)

  /** As-of merge with pandas direction semantics: "backward" (latest
    * right ≤ t), "forward" (earliest right ≥ t), "nearest" (closer of
    * the two, distance ties to backward). One merge pass either way:
    * backward folds passed rows into a single candidate, forward peeks
    * the next unconsumed row — both O(1) state per partition.
    */
  def asofMerge(left: DataFrame, right: DataFrame, leftOn: String,
      rightOn: String, by: Seq[String], rightCols: Seq[String],
      direction: String, toleranceSec: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown direction $direction")
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias every right attribute: left/right often share lineage
    // (self-asof on one table), and duplicate ExprIds across children
    // would make the custom node ambiguous — fresh ids sidestep the
    // analyzer's relation dedup, which knows nothing about this node
    val rAnalyzed = right.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(rAliases, rAnalyzed)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val node = AsofMergeJoinPlan(lPlan, rPlan,
      attr(lPlan, leftOn), attr(rPlan, rightOn),
      by.map(attr(lPlan, _)), by.map(attr(rPlan, _)),
      rightCols.map(attr(rPlan, _)), direction,
      toleranceSec.map(_ * 1000000L))
    ColumnBridge.ofRows(spark, node)
  }

  def install(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsofMergeJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofMergeJoinStrategy
}

case class AsofMergeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftOn: Attribute, rightOn: Attribute,
    leftBy: Seq[Attribute], rightBy: Seq[Attribute],
    rightCols: Seq[Attribute], direction: String, toleranceUs: Option[Long])
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightCols.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan,
      r: LogicalPlan): AsofMergeJoinPlan = copy(left = l, right = r)
}

object AsofMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsofMergeJoinPlan =>
      AsofMergeJoinExec(planLater(p.left), planLater(p.right),
        p.leftOn, p.rightOn, p.leftBy, p.rightBy, p.rightCols,
        p.direction, p.toleranceUs) :: Nil
    case _ => Nil
  }
}

/** Per-partition merge: children arrive hash-clustered on the by keys
  * and sorted by (by, time) — EnsureRequirements inserts the exchanges
  * and sorts from the declared requirements, so AQE/bucketing can
  * elide them exactly as for a sort-merge join.
  */
case class AsofMergeJoinExec(left: SparkPlan, right: SparkPlan,
    leftOn: Attribute, rightOn: Attribute,
    leftBy: Seq[Attribute], rightBy: Seq[Attribute],
    rightCols: Seq[Attribute], direction: String, toleranceUs: Option[Long])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightCols.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil
  // The right-side payload columns join the sort AFTER (by, on): when the
  // right side holds duplicate (by, on) pairs, the merge folds ties in
  // sort order and keeps the last, so without this the winning duplicate
  // would be whatever tie order the shuffle sort happened to produce.
  // With it, backward deterministically resolves to the MAX orderable
  // payload tuple and forward to the MIN — same answer every run, every
  // partitioning. Non-orderable payloads (maps) stay un-tiebroken.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftBy.map(SortOrder(_, Ascending)) :+ SortOrder(leftOn, Ascending),
    (rightBy.map(SortOrder(_, Ascending)) :+ SortOrder(rightOn, Ascending)) ++
      rightCols.filter(c => RowOrdering.isOrderable(c.dataType))
        .map(SortOrder(_, Ascending)))
  override def outputOrdering: Seq[SortOrder] =
    leftBy.map(SortOrder(_, Ascending)) :+ SortOrder(leftOn, Ascending)
  override protected def withNewChildrenInternal(l: SparkPlan,
      r: SparkPlan): AsofMergeJoinExec = copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftBy.map(_.dataType)
    val tolOpt = toleranceUs
    val dir = direction match {
      case "backward" => 0; case "forward" => 1; case _ => 2
    }
    val numRightCols = rightCols.length
    val leftOutput = left.output
    val rightOutput = right.output
    val leftOnExpr = leftOn
    val rightOnExpr = rightOn
    val leftByExprs = leftBy
    val rightByExprs = rightBy
    val rightColExprs: Seq[Expression] = rightCols
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(leftByExprs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rightByExprs, rightOutput)
      val lTs = BindReferences.bindReference(leftOnExpr: Expression, leftOutput)
      val rTs = BindReferences.bindReference(rightOnExpr: Expression, rightOutput)
      val rVals = UnsafeProjection.create(rightColExprs, rightOutput)
      val joiner = UnsafeProjection.create(outputAttrs,
        leftOutput ++ rightCols.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(numRightCols)
      val rBuf = rIt.buffered

      var prevKey: UnsafeRow = null
      var prevTs = 0L
      var prevVals: UnsafeRow = null

      def tsOf(e: Expression, row: InternalRow): java.lang.Long =
        e.eval(row) match {
          case null => null
          case l: java.lang.Long => l
          case i: java.lang.Integer => i.longValue()
          case other => java.lang.Long.valueOf(other.toString)
        }

      lIt.map { lRow =>
        val k = lKeyProj(lRow)
        if (prevKey != null && keyOrd.compare(prevKey, k) != 0) {
          prevKey = null; prevVals = null
        }
        val t = tsOf(lTs, lRow)
        if (t != null) {
          // advance the right side: consume rows of smaller keys
          // outright; within the key, fold rows with ts <= t into the
          // running candidate; stop at the first row beyond t
          var advance = true
          while (advance && rBuf.hasNext) {
            val h = rBuf.head
            val hk = rKeyProj(h)
            val cmp = keyOrd.compare(hk, k)
            if (cmp < 0) { rBuf.next() }
            else if (cmp == 0) {
              val ht = tsOf(rTs, h)
              if (ht == null) { rBuf.next() } // nulls sort first; never match
              else if (ht.longValue() <= t.longValue()) {
                prevKey = hk.copy()
                prevTs = ht.longValue()
                prevVals = rVals(h).copy()
                rBuf.next()
              } else advance = false
            } else advance = false
          }
        }
        // backward candidate: the folded prev; forward candidate: an
        // exact-ts row lands in prev (inclusive), otherwise the peeked
        // head (first unconsumed row of this key, ts > t)
        val bwdOk = t != null && prevVals != null &&
          tolOpt.forall(t.longValue() - prevTs <= _)
        def fwdCandidate(): (InternalRow, Long) = {
          if (t == null) null
          else if (prevVals != null && prevTs == t.longValue()) (prevVals, prevTs)
          else if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), k) == 0) {
            val ht = tsOf(rTs, rBuf.head)
            if (ht != null && tolOpt.forall(ht.longValue() - t.longValue() <= _))
              (rVals(rBuf.head), ht.longValue())
            else null
          } else null
        }
        val chosen: InternalRow = dir match {
          case 0 => if (bwdOk) prevVals else nullRow // backward
          case 1 => Option(fwdCandidate()).map(_._1).getOrElse(nullRow)
          case _ => // nearest: closer wins, ties backward
            val f = fwdCandidate()
            if (bwdOk && f != null) {
              if (f._2 - t.longValue() < t.longValue() - prevTs) f._1 else prevVals
            } else if (bwdOk) prevVals
            else if (f != null) f._1
            else nullRow
        }
        joiner(joined(lRow, chosen))
      }
    }
  }
}
