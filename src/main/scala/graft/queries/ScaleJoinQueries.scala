package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.ScaleJoins

/** Gates for graft.ops.ScaleJoins — the join strategies for shapes that
  * defeat the default planner at 100 TB. Each oracle computes the same
  * result the NAIVE way (plain semi-join / BETWEEN join / window
  * sessionization), so the gate proves the scale rewrite is
  * result-invariant, not just plausible.
  */
object ScaleJoinQueries extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // Bloom-prefiltered semi-join: lineitem rows of expensive orders.
    // The bloom sketch prunes the fact side BEFORE its shuffle; the
    // trailing exact semi-join removes false positives, so the result
    // equals the plain semi-join the oracle runs.
    "q14b_bloom_semi_join" -> ((s, d) => {
      val dim = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      ScaleJoins.bloomSemiJoin(Tables.lineitem(s, d), dim,
          "l_orderkey", "o_orderkey", expectedItems = 200000)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Binned point-in-interval join: overlapping price bands derived
    // from region (band k covers [40000k, 40000k+59999] — the 20k
    // overlap forces multi-matches). Spark would plan the raw BETWEEN
    // as BroadcastNestedLoopJoin; the bin rewrite makes it an
    // equi-join on the bin id with each band replicated to ≤2 bins.
    "q19b_range_join_binned" -> ((s, d) => {
      val bands = Tables.region(s, d).select(col("r_name").as("band"),
        (col("r_regionkey") * lit(40000.0)).as("lo"),
        (col("r_regionkey") * lit(40000.0) + lit(59999.0)).as("hi"))
      ScaleJoins.rangeJoinBinned(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
          bands, "o_totalprice", "lo", "hi", binWidth = 40000.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("band"))
    }),

    // Interval×interval overlap join: region price bands vs narrower
    // nation bands — each qualifying pair emitted exactly once via the
    // first-common-bin rule (no dedup pass)
    "q19d_interval_overlap_join" -> ((s, d) => {
      val a = Tables.region(s, d).select(col("r_name").as("a_name"),
        (col("r_regionkey") * lit(40000.0)).as("a_lo"),
        (col("r_regionkey") * lit(40000.0) + lit(59999.0)).as("a_hi"))
      val b = Tables.nation(s, d).select(col("n_name").as("b_name"),
        (col("n_nationkey") * lit(15000.0)).as("b_lo"),
        (col("n_nationkey") * lit(15000.0) + lit(25000.0)).as("b_hi"))
      ScaleJoins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
          binWidth = 40000.0)
        .select(col("a_name"), col("b_name"))
        .orderBy(col("a_name"), col("b_name"))
    }),

    // Same range join written the DECLARATIVE way: the user writes the
    // plain theta join (via RangeBinJoin.rangeCond) and the custom
    // Catalyst rule rewrites it to the binned equi-join inside the
    // optimizer — the option-(c) tier of SURVEY §2.3. Identical result
    // to q19b by construction; PlanSpec asserts the rewrite fires.
    "q19c_range_join_rule" -> ((s, d) => {
      graft.plans.RangeBinJoin.install(s)
      val bands = Tables.region(s, d).select(col("r_name").as("band"),
        (col("r_regionkey") * lit(40000.0)).as("lo"),
        (col("r_regionkey") * lit(40000.0) + lit(59999.0)).as("hi"))
      Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        .join(bands, graft.plans.RangeBinJoin.rangeCond(
          col("o_totalprice"), col("lo"), col("hi"), binWidth = 40000.0))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("band"))
    }),

    // Gap-based batch sessionization (6 h gap ≈ the fixture's median
    // inter-event gap, so sessions have a few events each). µs-integer
    // gap arithmetic on both sides — no float second boundaries.
    "q58_sessionize" -> ((s, d) => {
      ScaleJoins.sessionize(Tables.events(s, d), "user_id", "ts",
          gapSec = 21600)
        .select(col("event_id"), col("user_id"), col("session_idx"))
        .orderBy(col("event_id"))
    }),

    // Per-session rollup of the same sessionization.
    "q58b_session_stats" -> ((s, d) => {
      ScaleJoins.sessionStats(Tables.events(s, d), "user_id", "ts",
          gapSec = 21600, valueCol = "value")
        .orderBy(col("user_id"), col("session_idx"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q14b_bloom_semi_join" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q19b_range_join_binned" ->
      """WITH bands AS (SELECT r_name AS band,
        |    r_regionkey * 40000.0 AS lo,
        |    r_regionkey * 40000.0 + 59999.0 AS hi
        |  FROM region)
        |SELECT band, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q19d_interval_overlap_join" ->
      """WITH a AS (SELECT r_name AS a_name,
        |    r_regionkey * 40000.0 AS a_lo,
        |    r_regionkey * 40000.0 + 59999.0 AS a_hi FROM region),
        |b AS (SELECT n_name AS b_name,
        |    n_nationkey * 15000.0 AS b_lo,
        |    n_nationkey * 15000.0 + 25000.0 AS b_hi FROM nation)
        |SELECT a_name, b_name FROM a JOIN b
        |  ON a_lo <= b_hi AND b_lo <= a_hi
        |ORDER BY a_name, b_name""".stripMargin,

    "q19c_range_join_rule" ->
      """WITH bands AS (SELECT r_name AS band,
        |    r_regionkey * 40000.0 AS lo,
        |    r_regionkey * 40000.0 + 59999.0 AS hi
        |  FROM region)
        |SELECT band, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS sum_price
        |FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
        |GROUP BY band ORDER BY band""".stripMargin,

    // same lag→flag→running-sum construction; epoch_us matches the
    // Spark side's unix_micros integer arithmetic exactly (FIXTURES.md:
    // ns fixtures compare at µs)
    "q58_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |l AS (SELECT event_id, user_id, ts,
        |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |      FROM e),
        |n AS (SELECT event_id, user_id, ts,
        |        CASE WHEN prev IS NULL
        |               OR epoch_us(ts) - epoch_us(prev) > 21600000000 THEN 1
        |             ELSE 0 END AS ns
        |      FROM l)
        |SELECT event_id, user_id,
        |  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
        |    AS session_idx
        |FROM n ORDER BY event_id""".stripMargin,

    "q58b_session_stats" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             value FROM events),
        |l AS (SELECT user_id, ts, value,
        |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |      FROM e),
        |n AS (SELECT user_id, ts, value,
        |        CASE WHEN prev IS NULL
        |               OR epoch_us(ts) - epoch_us(prev) > 21600000000 THEN 1
        |             ELSE 0 END AS ns
        |      FROM l),
        |sx AS (SELECT user_id, ts, value,
        |         CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT)
        |           AS session_idx
        |       FROM n)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000 AS BIGINT)
        |    AS span_sec,
        |  ROUND(SUM(value), 2) AS total_value
        |FROM sx GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin
  )
}
