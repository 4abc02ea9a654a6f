package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the pre-ingest gate a
  * 100 TB pipeline runs on every new shard before it is allowed into
  * the corpus (the great-expectations/dbt-test shape, expressed as one
  * Spark aggregation).
  *
  * Every expectation compiles to a conditional COUNT over the same
  * scan, so a suite of N checks costs ONE pass and one tiny
  * aggregation row regardless of N — no per-check jobs, no driver
  * loops. Violation counts are integers; the report is engine-exact.
  */
object Validate {

  /** One named check: `pred` is evaluated per row; a row where the
    * predicate is FALSE (null counts as a violation too — null means
    * "could not establish the property") is a violation.
    */
  final case class Expectation(name: String, pred: Column)

  /** Convenience constructors for the common checks. */
  def notNull(c: String): Expectation =
    Expectation(s"not_null($c)", col(c).isNotNull)
  def between(c: String, lo: Double, hi: Double): Expectation =
    Expectation(s"between($c,$lo,$hi)", col(c) >= lo && col(c) <= hi)
  def inSet(c: String, vals: Seq[String]): Expectation =
    Expectation(s"in_set($c)", col(c).isin(vals.map(lit): _*))
  def matches(c: String, re: String): Expectation =
    Expectation(s"matches($c)", col(c).rlike(re))
  def nonNegative(c: String): Expectation =
    Expectation(s"non_negative($c)", col(c) >= 0)

  /** Run a suite: one scan, one aggregation; per-expectation violation
    * counts and pass verdicts against an allowed violation rate in
    * parts-per-million (integer threshold arithmetic — no double
    * ratios in the verdict).
    *
    * @return (expectation, n_rows, n_violations, max_violation_ppm,
    *          passed) — one row per expectation, ordered as given
    */
  def expect(df: DataFrame, expectations: Seq[Expectation],
      maxViolationPpm: Long = 0L): DataFrame = {
    require(expectations.nonEmpty, "need at least one expectation")
    require(expectations.map(_.name).distinct.size == expectations.size,
      "expectation names must be unique")
    require(maxViolationPpm >= 0 && maxViolationPpm <= 1000000L,
      s"maxViolationPpm must be in [0, 1e6], got $maxViolationPpm")
    val aggs = count(lit(1)).as("__n") +:
      expectations.zipWithIndex.map { case (e, i) =>
        sum(when(coalesce(e.pred, lit(false)), 0L).otherwise(1L))
          .as(s"__v_$i") // positional alias: names may contain dots
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single aggregate row into one row per expectation via
    // an exploded literal array — still zero extra scans
    val entries = array(expectations.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("expectation"),
        col(s"__v_$i").as("n_violations"))
    }: _*)
    row.select(col("__n").as("n_rows"), explode(entries).as("e"))
      .select(col("e.expectation"), col("n_rows"), col("e.n_violations"),
        lit(maxViolationPpm).as("max_violation_ppm"))
      // integer verdict: violations * 1e6 <= ppm * rows (exact)
      .withColumn("passed",
        col("n_violations") * lit(1000000L) <= col("max_violation_ppm") * col("n_rows"))
  }

  /** Column census (`df.info()`-meets-profiler): per column the null
    * count, distinct count and min/max (as strings, so one schema fits
    * every column type).
    *
    * Shapes (both measured at sf0.1, PLANS.md): `exact = false` is the
    * 100 TB default — ONE scan, every column's HLL sketch + min/max in
    * a single aggregate. `exact = true` runs one scan per column with
    * an ordinary partial-distinct aggregate; folding N exact distincts
    * into one aggregate instead costs an (N+1)-way Expand of every row
    * and measured 7x slower than the per-column scans.
    *
    * @return (column_name, n_rows, n_nulls, n_distinct, min_str,
    *         max_str) — one row per requested column
    */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(cols.distinct.size == cols.size, "duplicate columns")
    if (exact) {
      cols.map { c =>
        df.agg(count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(col(c)).as("n_distinct"),
            min(col(c)).cast("string").as("min_str"),
            max(col(c)).cast("string").as("max_str"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_str"), col("max_str"))
      }.reduce(_ unionByName _)
    } else {
      val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$i"),
          approx_count_distinct(col(c)).as(s"__nd_$i"),
          min(col(c)).cast("string").as(s"__mn_$i"),
          max(col(c)).cast("string").as(s"__mx_$i"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*)
      val entries = array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column_name"), col(s"__nn_$i").as("n_nulls"),
          col(s"__nd_$i").as("n_distinct"), col(s"__mn_$i").as("min_str"),
          col(s"__mx_$i").as("max_str"))
      }: _*)
      row.select(col("__n").as("n_rows"), explode(entries).as("e"))
        .select(col("e.column_name"), col("n_rows"), col("e.n_nulls"),
          col("e.n_distinct"), col("e.min_str"), col("e.max_str"))
    }
  }

  /** Uniqueness is the one check that needs its own aggregation shape
    * (a distinct count, not a row predicate): returns
    * (column, n_rows, n_distinct, n_duplicate_rows, passed).
    */
  def expectUnique(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(cols.head, cols.tail: _*).as("n_distinct"))
      .select(lit(cols.mkString(",")).as("columns"), col("n_rows"),
        col("n_distinct"),
        (col("n_rows") - col("n_distinct")).as("n_duplicate_rows"),
        (col("n_rows") === col("n_distinct")).as("passed"))
  }
}
