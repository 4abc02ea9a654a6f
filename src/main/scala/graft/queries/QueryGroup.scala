package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of gated queries.
  *
  * Each query is a DataFrame program over the fixture tables plus a
  * DuckDB-dialect oracle SQL string computing the same result (SURVEY §5:
  * differential testing, DuckDB replacing the reference's pandas
  * `assert_eq` oracle). Queries without an expressible oracle (approx/
  * random/driver-specific) appear in `queries` only → the driver records
  * a weaker rows-only check.
  *
  * Conventions (FIXTURES.md "Oracle comparison rules"):
  *  - every query ends in an explicit, total ORDER BY (unique key last);
  *  - float aggregates are rounded to fixed decimals on BOTH sides;
  *  - column names are aliased identically on BOTH sides;
  *  - no raw DATE outputs (pandas date-vs-datetime repr diverges between
  *    the two readers) — format dates to ISO strings on both sides;
  *  - never construct values that land exactly on a .xx5 rounding
  *    boundary (e.g. dividing 2-decimal data by 2) — DuckDB's double
  *    ROUND is direction-inconsistent there.
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
