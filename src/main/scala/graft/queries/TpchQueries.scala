package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The classic TPC-H decision-support suite, fixture-adapted (NEW r15).
  *
  * Q1/Q3/Q5/Q18 shapes have been gated since round 1 (q01/q08/q09/
  * q09b); this group completes every remaining TPC-H query the reduced
  * fixture schema can express — Q4, Q6, Q7, Q8, Q10, Q13, Q14, Q15,
  * Q16', Q17, Q19, Q21, Q22. The fixture omits partsupp,
  * l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct, o_comment,
  * c_phone and p_container, so:
  *
  *  - Q2/Q11/Q20 (partsupp-bound) run against the DERIVED partsupp
  *    surrogate (q318–q320, r16 — see [[partsupp]]; marked Q2'/Q11'/
  *    Q20');
  *  - Q4's commit<receipt late-line predicate becomes
  *    l_shipdate > o_orderdate (same EXISTS-semi-join shape);
  *  - Q12's ship-mode split is unexpressible (no stand-in column
  *    carries its semantics) and is omitted;
  *  - Q13 drops the o_comment NOT LIKE filter (the left-join
  *    distribution is the shape);
  *  - Q16 counts DISTINCT suppliers via lineitem instead of partsupp
  *    (marked Q16');
  *  - Q17/Q19 drop the container predicate; Q21 uses the Q4 late-line
  *    stand-in; Q22's country code is c_nationkey mod 10 (no phone) and
  *    its anti-join is date-bounded ('no orders since 1999' — at tiny
  *    SF every customer has SOME order, and Q7's nation pair is 3/8,
  *    nations that hold suppliers at every SF).
  *
  * Everything else is per-spec shape: EXISTS / NOT EXISTS correlated
  * semi/anti joins, scalar subqueries, the Q19 OR-of-ANDs pushdown
  * block, left-join distributions, correlated per-group averages.
  * Revenue arithmetic follows the q08/q09 convention (double product,
  * ROUND(…, 2) on both sides); shares round to 4–6 decimals. Every
  * query ends in a total ORDER BY.
  */
object TpchQueries extends QueryGroup {

  private def li(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
  private def ord(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
  private def cust(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d)

  private val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Derived partsupp surrogate (r15 verdict item 3): the fixture has
    * no partsupp table, but distinct (l_partkey, l_suppkey) IS the set
    * of part-supplier relationships the data exercises, and the two
    * missing measures are synthesized DETERMINISTICALLY from the pair
    * key with the [[graft.ops.Features.foldCol]] split-multiply Knuth
    * fold (the q39b/foldCol discipline — exact int64 in both engines,
    * ANSI-safe):
    *
    *   ps_availqty        = fold(pk·65537 + sk, 9999) + 1     (1…9999)
    *   ps_supplycost_cents= fold((pk·65537 + sk)·31 + 7, 99900) + 100
    *   ps_supplycost      = cents / 100.0                 (1.00…999.99)
    *
    * Cents stay integer so Q11's HAVING-over-share-of-global-total can
    * compare EXACTLY (value_cents·10⁴ > total_cents·5 — no double-sum
    * ordering hazard); the double column exists for the per-spec
    * cost-equality of Q2. The oracle rebuilds the identical surrogate
    * via [[graft.ops.Features.foldSql]].
    *
    * 100 TB posture: one scan of lineitem projecting two int columns →
    * partial-aggregated distinct (the pair count is bounded by
    * |part|×|supp-per-part|, far below |lineitem|); the fold is
    * per-row arithmetic. Q2'/Q11'/Q20' then join it against broadcast
    * dims only.
    */
  private def partsupp(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import graft.ops.Features
    val h = "(ps_partkey * 65537 + ps_suppkey)"
    li(s, d)
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty", Features.foldCol(h, 9999) + 1)
      .withColumn("ps_supplycost_cents",
        Features.foldCol(s"($h * 31 + 7)", 99900) + 100)
      .withColumn("ps_supplycost", col("ps_supplycost_cents") / 100.0)
  }

  /** The surrogate as a DuckDB CTE body (shared by the three oracles). */
  private def psCte: String = {
    import graft.ops.Features
    val h = "(ps_partkey * 65537 + ps_suppkey)"
    s"""ps AS (SELECT ps_partkey, ps_suppkey,
       |    (${Features.foldSql(h, 9999)}) + 1 AS ps_availqty,
       |    (${Features.foldSql(s"($h * 31 + 7)", 99900)}) + 100
       |      AS ps_supplycost_cents,
       |    ((${Features.foldSql(s"($h * 31 + 7)", 99900)}) + 100) / 100.0
       |      AS ps_supplycost
       |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
       |      l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin
  }

  override def queries: Map[String, Q] = Map(

    // Q2': minimum-cost supplier — the correlated scalar-min subquery
    // over the region-restricted join, on the derived partsupp. The
    // per-part min is computed ONCE as a grouped frame over the
    // part-filtered candidate set (same result as the per-row
    // correlated min — the filter is on part attributes only), then
    // matched back by cost equality (exact: both engines build the
    // cost from the same integer cents)
    "q318_tpch02" -> ((s, d) => {
      val suppGeo = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val cand = partsupp(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_size") === 7 && col("p_type") === "STANDARD")
            .select(col("p_partkey"))),
          col("ps_partkey") === col("p_partkey"))
        .join(suppGeo, col("ps_suppkey") === col("s_suppkey"))
      // per-part min via a part-partitioned window, not a self-join:
      // one pass over ONE candidate subtree (a grouped-min + join-back
      // would re-derive the surrogate and scan lineitem twice)
      val wMin = org.apache.spark.sql.expressions.Window
        .partitionBy(col("ps_partkey"))
      cand
        .withColumn("min_cost", min(col("ps_supplycost")).over(wMin))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q11': important stock identification — the
    // HAVING-over-share-of-global-total shape. Exact integer cents
    // throughout: the share compare is value_cents * 10000 >
    // total_cents * 5 (threshold 0.05%), immune to double-sum order
    "q319_tpch11" -> ((s, d) => {
      val suppN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val v = partsupp(s, d)
        .join(suppN, col("ps_suppkey") === col("s_suppkey"))
        .withColumn("pv_cents",
          col("ps_supplycost_cents") * col("ps_availqty"))
      val byPart = v.groupBy(col("ps_partkey"))
        .agg(sum(col("pv_cents")).as("value_cents"))
      // global total as a 1-row scalar aggregate crossJoin(broadcast)
      // — the Q22 avg-balance discipline: no global window funnels
      // the |part|-row aggregate to one partition; the identical
      // byPart subtrees share their Exchange under AQE ReuseExchange
      val total = byPart.agg(sum(col("value_cents")).as("total_cents"))
      byPart
        .crossJoin(broadcast(total))
        .filter(col("value_cents") * 10000 > col("total_cents") * 5)
        .select(col("ps_partkey"),
          round(col("value_cents") / 100.0, 2).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // Q20': potential part promotion — the nested semi-join on the
    // derived quantity: suppliers whose availqty exceeds half their
    // 1996 shipped quantity of 'small%' parts. Pairs with no 1996
    // lines drop out (the spec's NULL-comparison semantics — the
    // correlated SUM is NULL there), expressed as the inner join
    "q320_tpch20" -> ((s, d) => {
      val qty96 = li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_partkey").as("qk"), col("l_suppkey").as("qs"))
        .agg(sum(col("l_quantity")).as("sq"))
      val eligible = partsupp(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_name").startsWith("small"))
            .select(col("p_partkey"))),
          col("ps_partkey") === col("p_partkey"), "leftsemi")
        .join(qty96, col("ps_partkey") === col("qk") &&
          col("ps_suppkey") === col("qs"))
        .filter(col("ps_availqty") > col("sq") * 0.5)
        .select(col("ps_suppkey"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            // NATION_3: holds eligible suppliers at every fixture SF
            // (the q303 discipline; NATION_5 is empty at sf0.001)
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(eligible, col("s_suppkey") === col("ps_suppkey"), "leftsemi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // Q4: order-priority checking — EXISTS semi-join into a bounded
    // count; the late-line predicate is the fixture stand-in
    "q301_tpch04" -> ((s, d) => {
      val o = ord(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val late = li(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(late,
          o("o_orderkey") === late("l_orderkey") &&
            late("l_shipdate") > o("o_orderdate"),
          "leftsemi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q6: forecasting revenue change — per-spec pure scan
    // filter+aggregate, the pushdown poster child
    "q302_tpch06" -> ((s, d) => {
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    }),

    // Q7: volume shipping between two nations, both directions,
    // grouped by shipment year
    "q303_tpch07" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_3" &&
            col("cust_nation") === "NATION_8") ||
          (col("supp_nation") === "NATION_8" &&
            col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q8: national market share inside a region for one part type —
    // the conditional-share aggregate over a 7-way join
    "q304_tpch08" -> ((s, d) => {
      val joined = li(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(ord(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
          col("c_nationkey") === col("cnk"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
      joined
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", rev).otherwise(0.0)) /
            sum(rev), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q10: returned-item reporting — revenue lost to returns per
    // customer, top 20
    "q305_tpch10" -> ((s, d) => {
      li(s, d).filter(col("l_returnflag") === "R")
        .join(ord(s, d)
            .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(round(sum(rev), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q13: customer order-count distribution — the LEFT-join double
    // grouping (customers with zero orders land in the 0 bucket)
    "q306_tpch13" -> ((s, d) => {
      val counts = cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14: promotion-effect revenue share over one month
    "q307_tpch14" -> ((s, d) => {
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(round(
          sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) * 100.0 /
            sum(rev), 4).as("promo_revenue"))
    }),

    // Q15: top supplier — revenue view + scalar-subquery max
    "q308_tpch15" -> ((s, d) => {
      val revenue = li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(rev), 2).as("total_revenue"))
      val top = revenue.agg(max(col("total_revenue")).as("mx"))
      Tables.supplier(s, d)
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(top), col("total_revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16': supplier breadth per part attribute — DISTINCT suppliers
    // via lineitem (the fixture has no partsupp), exclusion filters
    // per spec shape
    "q309_tpch16" -> ((s, d) => {
      li(s, d).select(col("l_partkey"), col("l_suppkey"))
        .join(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#1" &&
              col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q17: small-quantity-order revenue — the correlated per-part
    // average (computed once as a grouped frame, not per row)
    "q310_tpch17" -> ((s, d) => {
      val parts = Tables.part(s, d).filter(col("p_brand") === "Brand#1")
      val avgQty = li(s, d)
        .join(parts.select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("ak"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_cut"))
      li(s, d)
        .join(parts.select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("ak"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    // Q19: discounted revenue under the OR-of-ANDs predicate block —
    // the classic disjunctive-pushdown probe
    "q311_tpch19" -> ((s, d) => {
      li(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 30))
        .agg(round(sum(rev), 2).as("revenue"))
    }),

    // Q21: suppliers who kept orders waiting — the semi+anti
    // correlated pair on multi-supplier orders (late-line stand-in)
    "q312_tpch21" -> ((s, d) => {
      val l = li(s, d).select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      val o = ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val l1 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"),
          col("o_orderdate"))
      val others = l.select(col("l_orderkey").as("k2"),
        col("l_suppkey").as("sk2"))
      val lateOthers = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
      l1
        .join(others,
          col("k1") === col("k2") && col("sk1") =!= col("sk2"), "leftsemi")
        .join(lateOthers,
          col("k1") === col("k3") && col("sk1") =!= col("sk3"), "leftanti")
        .join(Tables.supplier(s, d), col("sk1") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // Q22: global sales opportunity — above-average balances with no
    // orders; country code = nationkey mod 10 (no phone column)
    "q313_tpch22" -> ((s, d) => {
      val avgBal = cust(s, d).filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("ab"))
      cust(s, d)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(ord(s, d)
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "leftanti")
        .groupBy(pmod(col("c_nationkey"), lit(10)).as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("cntrycode"))
    })
  )

  override def oracle: Map[String, String] = Map(

    // Q2'/Q11'/Q20' rebuild the identical derived partsupp via
    // Features.foldSql (psCte); Q2's inner min is the per-spec
    // correlated scalar subquery, Q11's HAVING compares exact cents
    "q318_tpch02" ->
      s"""WITH $psCte,
         |cand AS (
         |  SELECT s_acctbal, s_name, n_name, p_partkey, ps_partkey,
         |    ps_supplycost
         |  FROM ps
         |  JOIN part ON ps_partkey = p_partkey
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA' AND p_size = 7 AND p_type = 'STANDARD')
         |SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
         |FROM cand c
         |WHERE ps_supplycost = (
         |  SELECT MIN(ps2.ps_supplycost) FROM ps ps2
         |  JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
         |  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |  WHERE ps2.ps_partkey = c.ps_partkey AND r2.r_name = 'ASIA')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    "q319_tpch11" ->
      s"""WITH $psCte,
         |v AS (
         |  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS pv_cents
         |  FROM ps
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3')
         |SELECT ps_partkey, ROUND(SUM(pv_cents) / 100.0, 2) AS value
         |FROM v
         |GROUP BY ps_partkey
         |HAVING SUM(pv_cents) * 10000 >
         |  (SELECT SUM(pv_cents) FROM v) * 5
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q320_tpch20" ->
      s"""WITH $psCte
         |SELECT s_name, s_acctbal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM ps
         |    WHERE ps_partkey IN
         |      (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND ps_availqty > (
         |        SELECT 0.5 * SUM(l_quantity) FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
         |ORDER BY s_name""".stripMargin,

    "q301_tpch04" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q302_tpch06" ->
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q303_tpch07" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q304_tpch08" ->
      """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
        |  ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q305_tpch10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q306_tpch13" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q307_tpch14" ->
      """SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |  / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,

    "q308_tpch15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q309_tpch16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q310_tpch17" ->
      """SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS ak, 0.2 * AVG(l_quantity) AS qty_cut
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE p_brand = 'Brand#1' GROUP BY l_partkey) a
        |  ON l_partkey = a.ak
        |WHERE p_brand = 'Brand#1' AND l_quantity < qty_cut""".stripMargin,

    "q311_tpch19" ->
      """SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity >= 1 AND l_quantity <= 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity >= 10 AND l_quantity <= 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,

    "q312_tpch21" ->
      """WITH f AS (SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderstatus = 'F'),
        |late AS (SELECT l_orderkey, l_suppkey FROM lineitem
        |  JOIN f ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q313_tpch22" ->
      """SELECT c_nationkey % 10 AS cntrycode, COUNT(*) AS numcust,
        |  ROUND(SUM(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
        |    WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY 1 ORDER BY cntrycode""".stripMargin
  )
}
