package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY §6 / §4.2: "skewed keys → salting
  * or AQE skew-join"). AQE handles sort-merge-join skew automatically at
  * runtime; these are the explicit variants for the cases AQE cannot
  * see — hot keys in aggregations (a single reducer receiving one key's
  * entire volume) and broadcast-ineligible joins against a skewed build
  * side. The reference has no equivalent: dask-cudf shuffles hash(key)
  * and a hot key lands on one worker [python/dask_cudf/dask_cudf/
  * backends.py :: hash_object_cudf].
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. A key receiving X rows spreads over `salts`
    * reducers in phase 1; phase 2 merges `salts` partial rows per key.
    * Supported merges: the reference's OPTIMIZED_AGGS decompositions
    * (count→sum of counts, sum→sum, min→min, max→max; avg as sum/count).
    */
  def saltedAgg(df: DataFrame, key: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"),
        min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    partial
      .groupBy(key.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_v"),
        min(col("__mn")).as("min_v"), max(col("__mx")).as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random
    * salt in [0, salts); the (smaller, broadcast-ineligible) right side
    * is replicated `salts`× with every salt value, and the join key
    * becomes (key, salt) — a hot left key now spreads over `salts`
    * reducers. Exact same rows as the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
