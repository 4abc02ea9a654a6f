package graft

import org.apache.spark.sql.functions._
import graft.ops.Validate
import graft.ops.Validate._

/** Specs for the expectation suite: exact violation counts, the
  * ppm-threshold boundary, null-predicate semantics, and the one-scan
  * plan claim.
  */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, 10.0, "A"), (2L, 20.0, "B"), (3L, -5.0, "A"), (4L, 200.0, "C")
  ).toDF("id", "v", "flag")

  test("expect: exact violation counts and strict pass verdicts") {
    val r = Validate.expect(df, Seq(
        notNull("id"), nonNegative("v"), between("v", 0, 100),
        inSet("flag", Seq("A", "B"))))
      .collect()
      .map(x => (x.getString(0), (x.getLong(2), x.getBoolean(4)))).toMap
    assert(r("not_null(id)") == ((0L, true)))
    assert(r("non_negative(v)") == ((1L, false)))   // -5
    assert(r("between(v,0.0,100.0)") == ((2L, false))) // -5, 200
    assert(r("in_set(flag)") == ((1L, false)))      // C
  }

  test("expect: null predicate counts as a violation") {
    val withNull = Seq((Some(1.0)), (None), (Some(-2.0)))
      .toDF("x")
    val r = Validate.expect(withNull, Seq(nonNegative("x"))).head
    assert(r.getAs[Long]("n_violations") == 2L) // null AND -2
  }

  test("expect: ppm threshold boundary is integer-exact") {
    // 1 violation in 4 rows = 250,000 ppm: passes at exactly 250000,
    // fails at 249999
    val ok = Validate.expect(df, Seq(nonNegative("v")), maxViolationPpm = 250000L)
    assert(ok.head.getAs[Boolean]("passed"))
    val notOk = Validate.expect(df, Seq(nonNegative("v")), maxViolationPpm = 249999L)
    assert(!notOk.head.getAs[Boolean]("passed"))
  }

  test("expectUnique flags duplicates with exact counts") {
    val dup = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k", "s")
    val r = Validate.expectUnique(dup, Seq("k", "s")).head
    assert(r.getAs[Long]("n_rows") == 3L && r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Long]("n_duplicate_rows") == 1L && !r.getAs[Boolean]("passed"))
    assert(Validate.expectUnique(dup.distinct(), Seq("k", "s"))
      .head.getAs[Boolean]("passed"))
  }

  test("suite compiles to ONE aggregation: single scan, no joins") {
    val plan = Validate.expect(df, Seq(notNull("id"), nonNegative("v"),
        between("v", 0, 100), inSet("flag", Seq("A"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // one aggregate over one scan — generate/explode adds no exchange
    assert(plan.split("LocalTableScan|Scan ").length <= 3, plan)
  }

  test("profile: per-column census with nulls, exact vs approx distinct") {
    val p = Seq((Some(1L), "x"), (None, "y"), (Some(1L), "x"), (Some(3L), "z"))
      .toDF("k", "s")
    val r = Validate.profile(p, Seq("k", "s"))
      .collect().map(x => (x.getString(0),
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4), x.getString(5)))).toMap
    assert(r("k") == ((4L, 1L, 2L, "1", "3"))) // nulls excluded from distinct/min/max
    assert(r("s") == ((4L, 0L, 3L, "x", "z")))
    // approx path returns the same schema and sane counts on tiny data
    val a = Validate.profile(p, Seq("k"), exact = false).head
    assert(a.getAs[Long]("n_distinct") >= 1L)
  }

  test("misuse guards: empty suite, duplicate names, bad ppm") {
    assertThrows[IllegalArgumentException] { Validate.expect(df, Seq.empty) }
    assertThrows[IllegalArgumentException] {
      Validate.expect(df, Seq(notNull("id"), notNull("id")))
    }
    assertThrows[IllegalArgumentException] {
      Validate.expect(df, Seq(notNull("id")), maxViolationPpm = -1L)
    }
  }
}
