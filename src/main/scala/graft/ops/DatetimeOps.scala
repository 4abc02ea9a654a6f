package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datetime long-tail helpers beyond Spark's built-in surface:
  * pandas `Series.dt.isocalendar()` and numpy `busday_count`
  * equivalents, as pure Column expressions (codegen-friendly, no UDF).
  */
object DatetimeOps {

  /** ISO-8601 day of week: 1 = Monday … 7 = Sunday (Spark's
    * `dayofweek` is 1 = Sunday).
    */
  def isoDow(d: Column): Column = (dayofweek(d) + lit(5)) % 7 + 1

  /** ISO-8601 week-numbering year: the calendar year of the Thursday
    * in d's ISO week (the standard trick — Jan 1..3 can belong to the
    * previous ISO year, Dec 29..31 to the next).
    */
  def isoYear(d: Column): Column = year(date_add(d, (lit(4) - isoDow(d)).cast("int")))

  /** ISO week number 1..53 (Spark's weekofyear is already ISO-8601). */
  def isoWeek(d: Column): Column = weekofyear(d)

  /** Weekday count in [start, end), numpy `busday_count` semantics with
    * the default Mon–Fri week. Requires start <= end (returns
    * nonsense, not an error, otherwise — same as a SQL replay would).
    *
    * Derivation: days = full_weeks*7 + rem; every full week has 5
    * weekdays; the rem-day tail starting at isodow(start)=dw spans
    * dows dw..dw+rem-1 (rem<=6, so at most one Saturday=6 and one
    * Sunday=7 counted via the two range tests — positions 8..12 are
    * the following Mon–Fri).
    */
  def busdayCount(start: Column, end: Column): Column = {
    val days = datediff(end, start)
    val dw = isoDow(start)
    val rem = days % 7
    val last = dw + rem - 1
    (floor(days / 7) * 5 + rem
      - when(dw <= 6 && last >= 6, 1).otherwise(0)
      - when(last >= 7, 1).otherwise(0)).cast("int")
  }
}
