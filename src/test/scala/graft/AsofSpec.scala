package graft

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

/** merge_asof semantics on tiny literal frames (backward/forward,
  * inclusive equality, tolerance, no-match → null).
  */
class AsofSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 10L), (2L, "A", 20L), (3L, "B", 15L), (4L, "A", 5L)
  ).toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", 5L, 1.0), ("A", 20L, 2.0), ("B", 99L, 9.0)
  ).toDF("sym", "t", "px")

  test("backward as-of picks latest quote at or before, null when none") {
    val res = AsofJoin.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(res == Map(1L -> Some(1.0), 2L -> Some(2.0), // t=20 inclusive
      3L -> None, 4L -> Some(1.0)))                     // t=5 inclusive
  }

  test("forward as-of picks earliest quote at or after") {
    val res = AsofJoin.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"), direction = "forward")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(res == Map(1L -> Some(2.0), 2L -> Some(2.0),
      3L -> Some(9.0), 4L -> Some(1.0)))
  }

  test("tolerance nulls matches farther than the bound") {
    val res = AsofJoin.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"), tolerance = lit(5))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(res == Map(1L -> Some(1.0), 2L -> Some(2.0),
      3L -> None, 4L -> Some(1.0)))
    val tight = AsofJoin.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"), tolerance = lit(2))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(tight == Map(1L -> None, 2L -> Some(2.0), 3L -> None, 4L -> Some(1.0)))
  }

  test("nearest as-of picks the closer side; distance 0 wins; tolerance gates per side") {
    val res = AsofJoin.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"), direction = "nearest")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(res == Map(
      1L -> Some(1.0), // A@10: back d=5 beats fwd d=10
      2L -> Some(2.0), // A@20: exact match, d=0
      3L -> Some(9.0), // B@15: only forward exists
      4L -> Some(1.0)))
    val tol = AsofJoin.asofJoin(trades, quotes, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"), direction = "nearest",
        tolerance = lit(6))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(tol(3L).isEmpty) // B fwd d=84 out of tolerance
    assert(tol(1L) == Some(1.0))
  }

  test("nearest as-of breaks exact-distance ties backward (pandas rule)") {
    val t2 = Seq((1L, "A", 12L)).toDF("trade_id", "sym", "t")
    val q2 = Seq(("A", 4L, 1.0), ("A", 20L, 2.0)).toDF("sym", "t", "px")
    val res = AsofJoin.asofJoin(t2, q2, "t", "t",
        by = Seq("sym"), rightCols = Seq("px"), direction = "nearest")
      .select("px").as[Option[Double]].head()
    assert(res == Some(1.0)) // d=8 both ways → backward
  }

  test("as-of plan is one shuffle on the by-keys (no range join blowup)") {
    val plan = AsofJoin.asofJoin(trades, quotes, "t", "t",
      by = Seq("sym"), rightCols = Seq("px")).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }
}
