package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** dask's `map_overlap` mechanism (SURVEY §2.2/§2.10 —
  * [dask/dataframe/rolling.py :: map_overlap], surfaced in dask-cudf for
  * partition-boundary-crossing custom window logic): run an arbitrary
  * per-partition function over a globally ordered frame where each
  * partition is extended with `before` rows from the previous
  * partition's tail and `after` rows from the next partition's head,
  * then trim the halo from the output.
  *
  * Distribution: one `repartitionByRange` on the order column, two
  * per-partition row_number windows to tag the boundary rows, a union
  * that replicates ONLY the 2·(before+after)·numParts boundary rows, and
  * one keyed exchange to regroup — halo traffic is O(halo·parts),
  * independent of total rows, so the shape holds at any scale. Per-task
  * state is one partition plus its halo (the same bounded-partition
  * contract as groupby.apply).
  */
object Overlap {

  /** Apply `f` to each range-partition of `df` (sorted by `orderCol`,
    * extended by `before`/`after` halo rows from the neighbor
    * partitions). `f` must return exactly one output row per input row
    * (schema `outSchema`); outputs at halo positions are trimmed, so
    * every input row is emitted exactly once, by its owning partition.
    *
    * `orderCol` must cast to double (numeric/timestamp) and should be a
    * total order — rows tied on it may be presented to `f` in any
    * order. Equal keys never straddle a range-partition boundary, so
    * tie handling is still partition-local.
    *
    * Halo rows come from the IMMEDIATE neighbor partition only — the
    * same contract as dask's map_overlap, which requires
    * `before`/`after` not to exceed the smallest partition's row count
    * for window-equivalent results (dask raises; here the frame is
    * silently shorter, and OverlapSpec pins the exactly-once-per-row
    * guarantee that still holds).
    */
  def mapOverlap(df: DataFrame, orderCol: String, before: Int, after: Int,
      outSchema: StructType, numParts: Int = 0)(
      f: Seq[Row] => Seq[Row]): DataFrame = {
    require(before >= 0 && after >= 0, s"negative halo: $before/$after")
    val spark = df.sparkSession
    val dataCols = df.columns.toSeq
    // localCheckpoint pins __pid across the own/haloNext/haloPrev
    // branches (the searchSortedLarge two-branch hazard — see the
    // comment there): disagreeing pids would route halos to the wrong
    // destination partition
    val base = (if (numParts > 0) df.repartitionByRange(numParts, col(orderCol))
                else df.repartitionByRange(col(orderCol)))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ord", col(orderCol).cast("double"))
      .localCheckpoint()
    // per-partition windows (parallel): the last `before` rows of each
    // partition also serve as the NEXT partition's leading halo, the
    // first `after` rows as the PREVIOUS partition's trailing halo
    val wUp = Window.partitionBy(col("__pid")).orderBy(col("__ord").desc)
    val wDown = Window.partitionBy(col("__pid")).orderBy(col("__ord").asc)
    val tagged = base
      .withColumn("__rnUp", row_number().over(wUp))
      .withColumn("__rnDown", row_number().over(wDown))
    val own = tagged
      .withColumn("__dst", col("__pid")).withColumn("__own", lit(true))
    val haloNext = tagged.filter(col("__rnUp") <= before)
      .withColumn("__dst", col("__pid") + 1).withColumn("__own", lit(false))
    val haloPrev = tagged.filter(col("__rnDown") <= after)
      .withColumn("__dst", col("__pid") - 1).withColumn("__own", lit(false))
    val routed = own.unionByName(haloNext).unionByName(haloPrev)
      .filter(col("__dst") >= 0)
      .select((dataCols.map(col) :+ col("__ord") :+ col("__dst") :+
        col("__own")): _*)
    val n = dataCols.length // field layout: data..., __ord, __dst, __own
    val grouped = routed.groupByKey(_.getInt(n + 1))(Encoders.scalaInt)
    grouped.flatMapGroups { (_, it) =>
      val rows = it.toArray.sortBy(_.getDouble(n))
      val data: Seq[Row] = rows.map(r => Row.fromSeq(r.toSeq.take(n))).toSeq
      val outs = f(data)
      require(outs.length == rows.length,
        s"mapOverlap f returned ${outs.length} rows for ${rows.length} inputs")
      outs.iterator.zip(rows.iterator)
        .collect { case (o, r) if r.getBoolean(n + 2) => o }
    }(Encoders.row(outSchema))
  }
}
