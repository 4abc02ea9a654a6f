package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-key) join — the `merge_asof` the reference does NOT
  * support (SURVEY §2.3: dask.dataframe has a CPU-only limited version
  * [dask/dataframe/multi.py :: merge_asof]; cudf lacks the kernel, so
  * dask-cudf raises). Spark-first design: no range join, no per-key
  * loop — union both sides, single hash shuffle on the `by` keys, one
  * ordered window pass filling each left row with the most recent
  * (backward) / next (forward) right row.
  *
  * Scale: one Exchange(by) + one sort per side — the same cost profile
  * as any keyed window; no broadcast, no skew beyond what the key
  * distribution already implies. The right payload rides as ONE struct
  * so all matched columns provably come from the same right row.
  */
object AsofJoin {

  /** Left as-of join.
    *
    * @param leftOn / rightOn  event-time columns (orderable, same type)
    * @param by        equality keys present on both sides
    * @param rightCols right payload columns to attach
    * @param direction "backward" (latest right with rt <= lt, pandas
    *                  default), "forward" (earliest right with rt >= lt)
    *                  or "nearest" (closer of the two; ties take the
    *                  backward match, like pandas)
    * @param tolerance max |lt - rt| as a Column (e.g. expr("INTERVAL 10
    *                  MINUTE") or a numeric delta); matches farther away
    *                  are nulled. No tolerance when null.
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftOn: String,
      rightOn: String, by: Seq[String], rightCols: Seq[String],
      direction: String = "backward", tolerance: Column = null): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftCols = left.columns.toSeq

    // right rows must sort before left rows at equal time for backward
    // and nearest (so rt == lt is matchable at distance 0, where the
    // backward candidate always wins), after them for forward
    val rightRank = if (direction == "forward") 2 else 0
    val l = left
      .withColumn("__t", col(leftOn))
      .withColumn("__src", lit(1))
      .withColumn("__payload", lit(null).cast(structType(right, rightOn, rightCols)))
    val r = right
      .select(by.map(col) :+ col(rightOn).as("__t") :+ lit(rightRank).as("__src") :+
        struct(col(rightOn).as("__rt") +: rightCols.map(col): _*).as("__payload"): _*)
    // align schemas: left carries its full row, right side nulls the
    // left-only columns (typed nulls so unionByName resolves)
    val lAligned = l.select((by ++ Seq("__t", "__src", "__payload") ++
      leftCols.filterNot(by.contains)).map(col): _*)
    val rCols = (by ++ Seq("__t", "__src", "__payload")).toSet
    val rAligned = r.select(lAligned.schema.map(f =>
      if (rCols(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)

    val w0 = Window.partitionBy(by.map(col): _*).orderBy(col("__t"), col("__src"))
    val mBack = last(col("__payload"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val mFwd = first(col("__payload"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    // tolerance gates each candidate; for nearest it must apply BEFORE
    // choosing, or an out-of-tolerance nearer match would shadow an
    // in-tolerance farther one
    def tol(m: Column): Column =
      if (tolerance == null) m
      else when(abs(col("__t").cast("double") - m.getField("__rt").cast("double")) <=
        tolerance.cast("double"), m)

    val unioned = lAligned.unionByName(rAligned)
    val filled = direction match {
      case "backward" => unioned.withColumn("__m", tol(mBack))
      case "forward"  => unioned.withColumn("__m", tol(mFwd))
      case "nearest" =>
        // both fills ride the SAME window spec — still one shuffle+sort
        val u = unioned.withColumn("__b", tol(mBack)).withColumn("__f", tol(mFwd))
        val dB = abs(col("__t").cast("double") - col("__b.__rt").cast("double"))
        val dF = abs(col("__f.__rt").cast("double") - col("__t").cast("double"))
        u.withColumn("__m",
          when(col("__b").isNull, col("__f"))
            .when(col("__f").isNull, col("__b"))
            .when(dF < dB, col("__f"))
            .otherwise(col("__b"))) // tie → backward, matching pandas
    }

    filled
      .filter(col("__src") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  private def structType(right: DataFrame, rightOn: String, rightCols: Seq[String]) = {
    import org.apache.spark.sql.types._
    StructType(StructField("__rt", right.schema(rightOn).dataType) +:
      rightCols.map(c => right.schema(c)))
  }
}
