package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Declarative range-join acceleration — the SURVEY §2.3 option-(c)
  * tier: a custom Catalyst `Expression` + `Rule[LogicalPlan]` pair that
  * turns a point-in-interval theta join into a binned equi-join INSIDE
  * the optimizer, where the Dataset-level helper
  * [[graft.ops.ScaleJoins.rangeJoinBinned]] cannot reach (it requires
  * the caller to restructure their query; this rewrites the plan the
  * user actually wrote).
  *
  * A join written as
  * {{{ points.join(ivs, RangeBinJoin.rangeCond($"p", $"lo", $"hi", w)) }}}
  * is planned by stock Spark as BroadcastNestedLoopJoin — O(N·M)
  * comparisons, the scale-killer for interval lookups (IP→geo ranges,
  * time-interval enrichment). [[RangeBinJoinRule]] rewrites it to
  *
  * {{{ Project(out, Join(points + bin(p), explode(seq(bin(lo),bin(hi))) of ivs,
  *     bin_l = bin_r && lo <= p <= hi)) }}}
  *
  * an equi-shuffle join on the bin id: each interval is replicated to
  * the bins it overlaps, a point lands in exactly one bin, so each
  * qualifying pair meets exactly once and the residual range predicate
  * needs no post-dedup. The carrier expression [[RangeBinHint]] IS the
  * range predicate (evaluates `lo <= p <= hi`), so a session without
  * the rule still computes the identical result — just on the slow
  * plan. Single-conjunct design: the hint references BOTH sides, so no
  * optimizer batch can push it out of the join condition before the
  * rule sees it.
  *
  * Registered two ways: [[graft.Engine.session]] injects it via
  * `SparkSessionExtensions.injectOptimizerRule` (operator-optimization
  * batch); [[RangeBinJoin.install]] appends it to
  * `spark.experimental.extraOptimizations` for externally built
  * sessions (the Verify/Bench driver contract).
  */
object RangeBinJoin {

  /** Join condition: `lo <= point <= hi`, carrying the bin width for
    * [[RangeBinJoinRule]]. All three operands are cast to double so the
    * bin arithmetic and the residual predicate agree on type.
    */
  def rangeCond(point: Column, lo: Column, hi: Column,
      binWidth: Double): Column = {
    require(binWidth > 0, "binWidth must be positive")
    column(RangeBinHint(expression(point.cast("double")),
      expression(lo.cast("double")), expression(hi.cast("double")), binWidth))
  }

  /** Idempotently register the rewrite on a session not built by
    * [[graft.Engine.session]].
    */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(RangeBinJoinRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RangeBinJoinRule
}

/** `lo <= point <= hi` with an attached bin width. Evaluates exactly
  * like the plain conjunction (nulls → false), so correctness never
  * depends on the rewrite firing. CodegenFallback is acceptable: the
  * expression only survives to execution on sessions WITHOUT the rule.
  */
case class RangeBinHint(point: Expression, lo: Expression, hi: Expression,
    binWidth: Double) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(point, lo, hi)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val p = point.eval(input)
    val l = lo.eval(input)
    val h = hi.eval(input)
    p != null && l != null && h != null && {
      val pd = p.asInstanceOf[Double]
      pd >= l.asInstanceOf[Double] && pd <= h.asInstanceOf[Double]
    }
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): RangeBinHint =
    copy(point = c(0), lo = c(1), hi = c(2))
}

/** The rewrite. Fires on inner joins whose whole condition is a
  * [[RangeBinHint]] with the point on the left and the interval bounds
  * on the right (the canonical orientation [[RangeBinJoin.rangeCond]]
  * produces). The output contains no hint, so the rule is a fixpoint
  * after one application.
  */
object RangeBinJoinRule extends Rule[LogicalPlan] {

  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(e, Literal(w, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner,
          Some(h @ RangeBinHint(p, lo, hi, w)), hint)
        if p.references.subsetOf(left.outputSet) &&
          lo.references.subsetOf(right.outputSet) &&
          hi.references.subsetOf(right.outputSet) =>
      val binL = Alias(bin(p, w), "__graft_bin_l")()
      val leftP = Project(left.output :+ binL, left)
      val binR = AttributeReference("__graft_bin_r", LongType,
        nullable = false)()
      // null lo/hi → null sequence → explode emits nothing: same rows
      // the inner join would have dropped via the null-rejecting hint
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // reports unresolved and fails post-analysis plan validation.
      // Inverted intervals (lo > hi) must emit no bins, not throw —
      // sequence(start > stop, step 1) is a runtime error
      val seq = If(LessThanOrEqual(lo, hi),
        new Sequence(bin(lo, w), bin(hi, w), Literal(1L))
          .withTimeZone(conf.sessionLocalTimeZone),
        Literal.create(Array.empty[Long],
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
      val gen = Generate(
        Explode(seq),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(binR), child = right)
      val residual = And(GreaterThanOrEqual(p, lo), LessThanOrEqual(p, hi))
      val cond = And(EqualTo(binL.toAttribute, binR), residual)
      Project(j.output, Join(leftP, gen, Inner, Some(cond), hint))
  }
}
