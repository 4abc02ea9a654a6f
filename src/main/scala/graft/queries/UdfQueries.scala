package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Udfs

/** UDF / UDAF / UDTF-shaped escape hatches — SURVEY.md §2.10.
  *
  * | reference mechanism                       | here                      |
  * |-------------------------------------------|---------------------------|
  * | Series.map / applymap elementwise UDF     | q80 scalar `udf`          |
  * | dask Aggregation(chunk, agg, finalize)    | q81 Aggregator via `udaf` |
  * | groupby().apply(fn) (group → frame)       | q82 flatMapGroups         |
  * | map_partitions(fn)                        | q83 mapPartitions         |
  * | register for SQL use                      | q84 spark.udf.register    |
  *
  * Every query here is still oracle-checked: the UDF bodies are chosen to
  * be SQL-expressible so DuckDB can replay them. q82's flatMapGroups
  * materializes one group per task — fine for bounded per-user groups; an
  * unbounded-group top-k at 100 TB should use the window row_number plan
  * (q34) instead.
  */
object UdfQueries extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // elementwise scalar UDF (JVM lambda; no Python-worker hop)
    "q80_udf_scalar" -> ((s, d) => {
      val score = udf(Udfs.scoreFn)
      Tables.part(s, d)
        .filter(col("p_partkey") % 13 === 0)
        .select(col("p_partkey"), score(col("p_name")).as("score"))
        .orderBy(col("p_partkey"))
    }),

    // custom Aggregator (chunk/agg/finalize) as an untyped UDAF column
    "q81_udaf_weighted_mean" -> ((s, d) => {
      import s.implicits._
      val wm = udaf(Udfs.weightedMean)
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 4).as("wmean_price"))
        .orderBy(col("l_returnflag"))
    }),

    // rolling.apply analog: the SAME custom Aggregator evaluated over a
    // sliding window frame — pandas rolling(5).apply(weighted_mean),
    // which the reference cannot push into its groupby machinery at all.
    // Inputs are small INTEGERS (quantity weighted by linenumber%3+1):
    // the frame sums are then exact in double on both engines and the
    // ratio's denominator ≤ 15 can never produce a 4-decimal round-half
    // boundary (QueryGroup conventions — price-valued frames hit one)
    "q85_udaf_over_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wm = udaf(Udfs.weightedMean)
      // (orderkey, linenumber) is NOT unique in the synthetic lineitem
      // (14k dup pairs) — the 5-col key is, making frame order total
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
        .rowsBetween(-4, 0)
      Tables.lineitem(s, d).filter(pmod(col("l_orderkey"), lit(50)) === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_returnflag"),
          round(wm(col("l_quantity"),
            (pmod(col("l_linenumber"), lit(3)) + 1).cast("double")).over(w), 4)
            .as("roll_wmean"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("roll_wmean"))
    }),

    // groupby-apply analog: group → sorted top-2 rows (UDTF-shaped)
    "q82_flatmapgroups" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (uid, rows) =>
          rows.toSeq.sortBy(r => (-r._3, r._2)).take(2).map(r => (uid, r._2, r._3))
        }
        .toDF("user_id", "event_id", "value")
        .orderBy(col("user_id"), col("event_id"))
    }),

    // map_partitions analog: arbitrary per-partition row transform
    "q83_mappartitions" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select(col("event_id"), col("value"))
        .as[(Long, Double)]
        // NB: (v-10)*2 keeps 2-decimal precision — never lands on a .xx5
        // rounding boundary, where DuckDB's double ROUND diverges.
        .mapPartitions(_.map { case (id, v) =>
          (id, BigDecimal((v - 10.0) * 2.0).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        })
        .toDF("event_id", "norm")
        .orderBy(col("event_id"))
    }),

    // dask map_overlap: custom rolling logic that crosses partition
    // boundaries — trailing 3-row sum over a GLOBALLY ordered frame,
    // computed per range-partition with a 2-row halo (numParts=8 forces
    // real boundaries at sf0.01). Integer cents keep the fold exact, so
    // the hash gate is immune to fp association order.
    "q86_map_overlap" -> ((s, d) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val in = Tables.events(s, d)
        .filter(col("user_id") % 7 === 0)
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
      val outSchema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("roll3_cents", LongType)))
      graft.ops.Overlap.mapOverlap(in, "event_id", before = 2, after = 0,
        outSchema, numParts = 8) { rows =>
        rows.zipWithIndex.map { case (r, i) =>
          val lo = math.max(0, i - 2)
          Row(r.getLong(0),
            (lo to i).map(j => rows(j).getLong(1)).sum)
        }
      }.orderBy(col("event_id"))
    }),

    // SQL-registered UDF through the FunctionRegistry
    "q84_udf_sql" -> ((s, d) => {
      s.udf.register("graft_rev_up", Udfs.revUpFn)
      Tables.part(s, d).createOrReplaceTempView("part_v")
      s.sql(
        """SELECT p_partkey, graft_rev_up(p_name) AS rev_up
          |FROM part_v WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin)
    })
  )

  override def oracle: Map[String, String] = Map(
    "q80_udf_scalar" ->
      """SELECT p_partkey,
        |  CAST(LENGTH(p_name) * 2 + (LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', ''))) AS INTEGER) AS score
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin,

    "q81_udaf_weighted_mean" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wmean_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q86_map_overlap" ->
      """SELECT event_id,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
        |    ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
        |  ) AS BIGINT) AS roll3_cents
        |FROM events WHERE user_id % 7 = 0 ORDER BY event_id""".stripMargin,

    "q85_udaf_over_window" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
        |  ROUND(SUM(l_quantity * (l_linenumber % 3 + 1)) OVER w
        |    / SUM(CAST(l_linenumber % 3 + 1 AS DOUBLE)) OVER w, 4) AS roll_wmean
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    l_extendedprice ROWS 4 PRECEDING)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber, l_partkey,
        |  l_suppkey, roll_wmean""".stripMargin,

    "q82_flatmapgroups" ->
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events
        |) WHERE rn <= 2 ORDER BY user_id, event_id""".stripMargin,

    "q83_mappartitions" ->
      """SELECT event_id, ROUND((value - 10.0) * 2.0, 2) AS norm
        |FROM events ORDER BY event_id""".stripMargin,

    "q84_udf_sql" ->
      """SELECT p_partkey, REVERSE(UPPER(p_name)) AS rev_up
        |FROM part WHERE p_partkey % 13 = 0 ORDER BY p_partkey""".stripMargin
  )
}
