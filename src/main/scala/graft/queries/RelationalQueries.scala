package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational core — SURVEY.md §2.2 (projections/filters/row ops),
  * §2.3 (joins), §2.4 (aggregations), §2.6 (sorts/distinct/set ops).
  *
  * Reference surface: dask-cudf `merge` [dask/dataframe/multi.py ::
  * merge / hash_join], `groupby(...).agg` [python/dask_cudf/dask_cudf/
  * groupby.py :: groupby_agg], `sort_values` [python/dask_cudf/
  * dask_cudf/sorting.py :: sort_values] — all re-expressed as
  * declarative DataFrame plans so Catalyst picks broadcast/shuffle
  * strategies and pushes filters/projections into the parquet scan.
  */
object RelationalQueries extends QueryGroup {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  override def queries: Map[String, Q] = Map(
    // ---- flagship: TPC-H Q1-shaped partial+final aggregation --------
    "q01_agg_tpch1" -> ((s, d) => {
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // the same query through the SQL entry point the reference never
    // had (SURVEY §3.1 / §7.5: Spark SQL replaces the absent SQL layer)
    "q01b_sql_entry" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          ROUND(SUM(l_quantity), 2) AS sum_qty,
          ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    }),

    // SQL join + correlated EXISTS subquery (decorrelation is free in
    // Catalyst — SURVEY §4.1 row "subquery decorrelation")
    "q10b_sql_join" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT n.n_name, COUNT(*) AS n_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
        GROUP BY n.n_name
        ORDER BY n.n_name""")
    }),

    // ---- §2.2 projection + filter (pushed into the parquet scan) ----
    "q02_filter_project" -> ((s, d) => {
      li(s, d)
        .filter(col("l_quantity").between(5, 10) &&
          col("l_returnflag").isin("A", "R") && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- §2.2 binary/unary math (elementwise, codegen'd) ------------
    "q03_arith_funcs" -> ((s, d) => {
      li(s, d)
        .filter(col("l_orderkey") % 997 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("disc_price"),
          floor(col("l_quantity") / 7).as("floordiv7"),
          pmod(col("l_linenumber"), lit(3)).as("mod3"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          abs(col("l_quantity") * -1).as("abs_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- §2.2 fillna/dropna/isna analog (nulls via NULLIF) ----------
    "q04_null_ops" -> ((s, d) => {
      val withNulls = li(s, d).withColumn("nz_disc", nullif(col("l_discount"), lit(0.0)))
      withNulls
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          count(col("nz_disc")).as("n_nonzero_disc"),
          sum(when(col("nz_disc").isNull, 1).otherwise(0)).as("n_null_disc"),
          round(sum(coalesce(col("nz_disc"), lit(0.01))), 2).as("filled_sum"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- §2.2 where/mask + clip -------------------------------------
    // value replacement (reference replace(a,b) / na.replace —
    // [cpp/src/replace/]); expressed as the na.replace API over strings
    "q04b_value_replace" -> ((s, d) => {
      ord(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .na.replace("o_orderpriority",
          Map("1-URGENT" -> "P1", "2-HIGH" -> "P2", "3-MEDIUM" -> "P3"))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "q05_when_clip" -> ((s, d) => {
      li(s, d)
        .filter(col("l_orderkey") % 503 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") > 25, "hi").when(col("l_quantity") > 10, "mid").otherwise("lo").as("bucket"),
          round(least(greatest(col("l_extendedprice"), lit(1000.0)), lit(50000.0)), 2).as("clipped"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- §2.2 astype/cast grid --------------------------------------
    "q06_casts" -> ((s, d) => {
      li(s, d)
        .filter(col("l_orderkey") % 1499 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("key_str"),
          date_format(col("l_shipdate").cast("date"), "yyyy-MM-dd").as("ship_date"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          (col("l_quantity") > 20).cast("int").as("gt20"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- §1.3 decimal32/64/128 arithmetic + aggregation --------------
    // The fixtures are double-based, so the decimal surface is exercised
    // by casting to exact DECIMAL first (2 decimal places are exact for
    // the price columns), then doing scale-growing arithmetic and SUM/AVG
    // entirely in decimal. Result columns are cast to explicit
    // precision/scale on BOTH sides: Spark and DuckDB grow intermediate
    // precision by different rules ((p1+p2+1, s1+s2) vs (p1+p2, s1+s2)),
    // and the driver's schema compare sees that difference.
    // AVG is deliberately fixed-point (exact integer millionths): decimal
    // division TYPING diverges across engines (DuckDB AVG(DECIMAL) →
    // DOUBLE; Spark → exact decimal scale+4), and true averages land
    // exactly on rounding half-boundaries whenever the group count
    // divides the scale factor — so a rounded cross-engine AVG is a coin
    // flip, while integer floor-division is bit-exact everywhere.
    "q07_decimal" -> ((s, d) => {
      val price = col("l_extendedprice").cast("decimal(18,2)")
      val disc = col("l_discount").cast("decimal(18,2)")
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          // final decimals are emitted as canonical strings: the compare
          // harness reads both sides into pandas, where parquet decimals
          // arrive as Decimal objects but DuckDB decimals as float64 —
          // scale-pinned string rendering keeps the gate exact instead
          sum(price).cast("decimal(38,2)").cast("string").as("sum_price"),
          sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("decimal(38,4)").cast("string").as("sum_disc_price"),
          expr("CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) * 10000 DIV count(1) AS BIGINT)").as("avg_qty_u6"),
          min(price).cast("string").as("min_price"),
          max(price).cast("string").as("max_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- §2.3 joins ---------------------------------------------------
    "q10_join_inner" -> ((s, d) => {
      li(s, d).join(ord(s, d), col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    "q11_join_left" -> ((s, d) => {
      val rich = cust(s, d).filter(col("c_acctbal") > 5000)
      ord(s, d).join(rich, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), count(col("c_custkey")).as("matched"))
        .orderBy(col("o_orderstatus"))
    }),

    "q12_join_right" -> ((s, d) => {
      val rich = cust(s, d).filter(col("c_acctbal") > 5000)
      rich.join(ord(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), count(col("c_custkey")).as("matched"))
        .orderBy(col("o_orderstatus"))
    }),

    "q13_join_full" -> ((s, d) => {
      val a = ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k")).distinct()
      val b = li(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k2")).distinct()
      a.join(b, col("k") === col("k2"), "full")
        .agg(
          count(lit(1)).as("n"),
          count(col("k")).as("n_left"),
          count(col("k2")).as("n_right"))
        .orderBy(col("n"))
    }),

    // pandas merge(indicator=True): the _merge provenance column
    // (left_only/right_only/both) derived from marker nullness on a
    // full-outer join — same single shuffle as q13
    "q13c_merge_indicator" -> ((s, d) => {
      val a = ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k")).distinct().withColumn("__l", lit(1))
      val b = li(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("k2")).distinct().withColumn("__r", lit(1))
      a.join(b, col("k") === col("k2"), "full")
        .withColumn("_merge",
          when(col("__l").isNotNull && col("__r").isNotNull, "both")
            .when(col("__l").isNotNull, "left_only")
            .otherwise("right_only"))
        .groupBy(col("_merge")).agg(count(lit(1)).as("n"))
        .orderBy(col("_merge"))
    }),

    // CDC changeset apply (NEW r9): Delta-style MERGE — a two-version
    // changeset over a third of the customers (v1 stale, v2 wins;
    // every ninth touched key a delete) folded into the snapshot via
    // FrameOps.applyChangeSet: last-write-wins window + one anti-join,
    // the snapshot scanned once. Gate checks all four outcomes:
    // untouched pass-through, replaced rows carry v2's values (the
    // stale v1 +111 must NOT appear), deletes vanish, LWW ordering
    "q212_cdc_merge" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
      val touched = cust.filter(col("c_custkey") % 3 === 0)
      val changes = touched.select(col("c_custkey"), lit(1L).as("v"),
          lit("U").as("op"), col("c_name"),
          (col("c_acctbal") + 111).as("c_acctbal"), col("c_nationkey"))
        .unionByName(touched.select(col("c_custkey"), lit(2L).as("v"),
          when(col("c_custkey") % 9 === 0, "D").otherwise("U").as("op"),
          col("c_name"), (col("c_acctbal") + 555).as("c_acctbal"),
          col("c_nationkey")))
      graft.ops.FrameOps.applyChangeSet(cust, changes, "c_custkey",
          op = "op", version = "v")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    }),

    // time-travel snapshot (NEW r11): AS OF version 1 over q212's CDC
    // log — reconstructs the intermediate state (only the v=1 +111
    // updates; v=2's +555/deletes are after the asked version), the
    // Delta/Iceberg time-travel surface over the same deterministic
    // changeset fold
    "q239_snapshot_at" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_nationkey"))
      val touched = cust.filter(col("c_custkey") % 3 === 0)
      val changes = touched.select(col("c_custkey"), lit(1L).as("v"),
          lit("U").as("op"), col("c_name"),
          (col("c_acctbal") + 111).as("c_acctbal"), col("c_nationkey"))
        .unionByName(touched.select(col("c_custkey"), lit(2L).as("v"),
          when(col("c_custkey") % 9 === 0, "D").otherwise("U").as("op"),
          col("c_name"), (col("c_acctbal") + 555).as("c_acctbal"),
          col("c_nationkey")))
      graft.ops.FrameOps.snapshotAt(cust, changes, "c_custkey",
          asOfVersion = 1L, op = "op", version = "v")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    }),

    // pandas combine_first: fill this frame's nulls from another frame
    // aligned on the key — COALESCE over a left join, one shuffle
    "q04d_combine_first" -> ((s, d) => {
      val base = ord(s, d).filter(col("o_orderkey") % 149 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 298 === 0, lit(null))
            .otherwise(col("o_totalprice")).as("price"),
          when(col("o_orderpriority") === "1-URGENT", lit(null))
            .otherwise(col("o_orderpriority")).as("prio"))
      val other = ord(s, d).filter(col("o_orderkey") % 149 === 0)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 2, 2).as("price"),
          lit("FALLBACK").as("prio"))
      val o = other.select(col("o_orderkey"), col("price").as("__p2"),
        col("prio").as("__q2"))
      base.join(o, Seq("o_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("price"), col("__p2")).as("price"),
          coalesce(col("prio"), col("__q2")).as("prio"))
        .orderBy(col("o_orderkey"))
    }),

    "q14_join_semi" -> ((s, d) => {
      val urgent = ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
      cust(s, d).join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q15_join_anti" -> ((s, d) => {
      val urgent = ord(s, d).filter(col("o_orderpriority") === "1-URGENT")
      cust(s, d).join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q16_join_cross" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // broadcast the dim chain explicitly (nation/region are tiny at
    // every sf — SURVEY §6); AQE would also pick this at runtime.
    "q17_join_broadcast" -> ((s, d) => {
      cust(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
        .orderBy(col("r_name"))
    }),

    "q18_join_multikey" -> ((s, d) => {
      val a = li(s, d).select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val b = li(s, d).select(
        col("l_orderkey").as("r_orderkey"),
        col("l_linenumber").as("r_linenumber"),
        col("l_extendedprice").as("r_price"))
      a.join(b,
          col("l_orderkey") === col("r_orderkey") &&
            col("r_linenumber") === col("l_linenumber") + 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") + col("r_price"), 2).as("pair_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // non-equi join — not in the reference surface (SURVEY §2.3: libcudf
    // conditional_join unexposed); free in Spark via nested-loop join.
    "q19_join_nonequi" -> ((s, d) => {
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("k1"), col("n_name").as("name1"), col("n_regionkey").as("rk1"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("k2"), col("n_regionkey").as("rk2"))
      n1.join(n2, col("k2") > col("k1") && col("rk1") === col("rk2"))
        .groupBy(col("name1")).agg(count(lit(1)).as("n_larger"))
        .orderBy(col("name1"))
    }),

    // ---- headline multi-join pipelines (TPC-H Q3/Q5/Q18 shapes) ------
    // These exercise the join-planning story end to end: dim filters
    // reach the scans, customer⋈orders⋈lineitem is a chain of hash
    // shuffles on the natural keys, nation/region broadcast, and the
    // final agg is partial→final. The shapes Catalyst picks here are
    // exactly the plans a 100 TB run needs (PLANS.md).
    "q08_join_tpch3" -> ((s, d) => {
      val cut = lit("1996-06-01").cast("timestamp")
      cust(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(ord(s, d).filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(li(s, d).filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        // group on the RAW timestamp (matching the oracle) and format in a
        // post-agg projection: formatting inside groupBy would merge
        // intra-day timestamps on this side but not in DuckDB
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q09_join_tpch5" -> ((s, d) => {
      // local-supplier revenue per nation: the 6-way star join. The
      // supplier join carries the s_nationkey = c_nationkey co-location
      // predicate, so it is a multi-key equi-join, not a filter-after.
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"))
        .join(li(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q09b_join_tpch18" -> ((s, d) => {
      // large-volume customers: HAVING over the fact table feeds a
      // semi-join back into the 3-way join — the aggregate is computed
      // once, not per row; whether it is broadcast or shuffled is AQE's
      // runtime call (its size grows with SF, so no broadcast hint here).
      val big = li(s, d).groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
        .filter(col("total_qty") > 250)
      ord(s, d).join(big, col("o_orderkey") === col("l_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    }),

    // ---- §2.4 aggregations -------------------------------------------
    "q20_agg_stats" -> ((s, d) => {
      li(s, d).groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("std_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(stddev_samp(col("l_discount")), 6).as("std_disc"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(col("l_quantity")), 4).as("avg_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q21_agg_countdistinct" -> ((s, d) => {
      li(s, d).groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_partkey")).as("nd_part"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // approx distinct (HLL++) — epsilon-compared, no hash oracle (SURVEY §7.4)
    // approx_count_distinct gated as a BOUNDED check: the HLL++ estimate
    // is engine-specific, so the query emits the exact count plus an
    // ok flag asserting relative error ≤ 5% — the oracle expects ok=1,
    // so estimator drift now hash-mismatches instead of passing rows-only
    "q21b_agg_approx_distinct" -> ((s, d) => {
      li(s, d).groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("exact_nd"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("approx") - col("exact_nd")).cast("double") / col("exact_nd")
            <= 0.05).cast("int").as("ok"))
        .orderBy(col("l_returnflag"))
    }),

    // mergeable HLL sketches (Apache DataSketches, built into Spark):
    // per-group sketches estimate group NDV, and hll_union_agg merges
    // them into the global NDV WITHOUT rescanning — the 100 TB pattern
    // (sketch per partition/day, union at read time). Gated like q21b:
    // exact NDV both sides + an ok flag bounding the estimate's error;
    // the union row proves merge correctness, not just per-group math.
    "q21c_agg_hll_sketch" -> ((s, d) => {
      // ONE lineitem scan: HLL is duplicate-insensitive, so the distinct
      // (status, partkey) pairs feed both the sketches AND the exact
      // counts (countDistinct per group ≡ count over the pairs), and the
      // checkpointed per-group sketch frame is reused by the union leg
      // instead of re-scanning + re-sketching raw lineitem (the r8 bench
      // had this query as the catalog's slowest at 4.4 s — four scans,
      // two sketch builds)
      val pairs = li(s, d).select(col("l_linestatus"), col("l_partkey"))
        .distinct().localCheckpoint(true)
      val sk = pairs.groupBy(col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"),
          count(lit(1)).as("exact_nd"))
        .localCheckpoint(true)
      val per = sk.select(col("l_linestatus").as("grp"), col("exact_nd"),
        (abs(hll_sketch_estimate(col("sk")) - col("exact_nd")).cast("double")
          / col("exact_nd") <= 0.05).cast("int").as("ok"))
      val all = sk.agg(hll_union_agg(col("sk")).as("sku"))
        .crossJoin(pairs.select(col("l_partkey")).distinct()
          .agg(count(lit(1)).as("exact_nd")))
        .select(lit("ALL").as("grp"), col("exact_nd"),
          (abs(hll_sketch_estimate(col("sku")) - col("exact_nd")).cast("double")
            / col("exact_nd") <= 0.05).cast("int").as("ok"))
      per.unionByName(all).orderBy(col("grp"))
    }),

    // Count-Min Sketch point queries (explicit hash family, so DuckDB
    // replays the identical sketch): estimates vs exact counts for the
    // probed users; width 64 makes collisions real, so the overcount
    // property (est >= exact, never under) is exercised, not vacuous
    "q21d_cms_estimate" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val sketch = graft.ops.Sketches.cmsBuild(ev, "user_id",
        depth = 4, width = 64)
      val probes = ev.filter(col("user_id") % 25 === 0)
        .select(col("user_id")).distinct
      val exact = ev.filter(col("user_id") % 25 === 0)
        .groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
      graft.ops.Sketches.cmsEstimate(sketch, probes, "user_id",
          depth = 4, width = 64)
        .join(exact, Seq("user_id"))
        .select(col("user_id"), col("cms_est"), col("exact_cnt"))
        .orderBy(col("user_id"))
    }),

    // CMS join-size estimation (NEW r9): predict |orders ⋈ lineitem|
    // on orderkey from two tiny sketches — the AMS inner-product
    // planning primitive — next to the exact size. Two widths: 64
    // (collisions dominate — the never-undercount property is
    // exercised hard) and 16384 (≥ distinct keys at sf0.01 — the
    // estimate collapses onto the truth, showing the ε = e/width
    // error bound doing its job)
    "q211_cms_join_size" -> ((s, d) => {
      def est(w: Int) = graft.ops.Sketches.cmsJoinSizeEstimate(
        Tables.orders(s, d).select(col("o_orderkey").as("k")),
        Tables.lineitem(s, d).select(col("l_orderkey").as("k")),
        "k", depth = 4, width = w)
      val exact = Tables.orders(s, d).select(col("o_orderkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("exact_size"))
      est(64).unionByName(est(16384)).crossJoin(exact)
        .select(col("width"), col("join_size_est"), col("exact_size"),
          (col("join_size_est") >= col("exact_size")).cast("int").as("never_under"))
        .orderBy(col("width"))
    }),

    // weighted (turnstile) CMS: cells accumulate SUM(weight), not
    // COUNT(*) — the form a token-count or byte-count heavy-hitter
    // sketch needs. Weight = exact integer cents of `value` (the q72b
    // lesson: integer weights keep both engines' sums exact), same
    // replayable hash family as q21d. Gates the r7-ADVICE fix (the
    // weighted path used to drop the weight column before the agg).
    "q21e_cms_weighted" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("w", round(col("value") * 100, 0).cast("long"))
      val sketch = graft.ops.Sketches.cmsBuild(ev, "user_id",
        depth = 4, width = 64, weight = Some("w"))
      val probes = ev.filter(col("user_id") % 25 === 0)
        .select(col("user_id")).distinct
      val exact = ev.filter(col("user_id") % 25 === 0)
        .groupBy(col("user_id")).agg(sum(col("w")).as("exact_w"))
      graft.ops.Sketches.cmsEstimate(sketch, probes, "user_id",
          depth = 4, width = 64, as = "cms_w")
        .join(exact, Seq("user_id"))
        .select(col("user_id"), col("cms_w"), col("exact_w"))
        .orderBy(col("user_id"))
    }),

    // mergeable histogram quantiles (NEW r8): the third quantile tier
    // beside exact q23 and approx-contract q23b — one scan builds a
    // 64-bucket histogram over a fixed range, the quantile walk runs
    // on the 64-row frame; shards merge by integer addition
    // (SketchSpec proves merge ≡ whole build and the bucket-width
    // error bound vs the exact quantile)
    "q192_hist_quantile" -> ((s, d) => {
      val h = graft.ops.Sketches.histBuild(Tables.lineitem(s, d),
        "l_extendedprice", lo = 0.0, hi = 110000.0, nBuckets = 64)
      graft.ops.Sketches.histQuantile(h, lo = 0.0, hi = 110000.0,
          nBuckets = 64, qs = Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy(col("q"))
    }),

    "q22_agg_collect" -> ((s, d) => {
      ord(s, d).groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    "q23_agg_quantile" -> ((s, d) => {
      li(s, d).groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("q50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("q75"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))
    }),

    // approx quantile (the reference's t-digest tier; Spark's GK sketch
    // via percentile_approx). Like q21b the estimate itself is
    // engine-specific, so the gated columns are the exact quantiles plus
    // an ok flag asserting ≤2% relative error of the sketch
    "q23b_approx_quantile" -> ((s, d) => {
      val relErr = (a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =>
        abs(a.cast("double") - e) / e <= 0.02
      li(s, d).groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("a50"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000)).as("a90"),
          expr("percentile(l_quantity, 0.5)").as("e50"),
          expr("percentile(l_extendedprice, 0.9)").as("e90"))
        .select(col("l_returnflag"),
          round(col("e50"), 4).as("exact_q50"),
          round(col("e90"), 4).as("exact_p90"),
          (relErr(col("a50"), col("e50")) && relErr(col("a90"), col("e90")))
            .cast("int").as("ok"))
        .orderBy(col("l_returnflag"))
    }),

    "q24_agg_argminmax" -> ((s, d) => {
      ord(s, d).groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_custkey"), col("o_orderkey")).as("last_cust"),
          min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderpriority"))
    }),

    "q25_value_counts" -> ((s, d) => {
      graft.ops.FrameOps.valueCounts(Tables.events(s, d), Seq("event_type"))
    }),

    // value_counts(normalize=True): exact int/int fraction of total —
    // no rounding, the raw double is bit-identical cross-engine
    "q25d_value_counts_norm" -> ((s, d) => {
      graft.ops.FrameOps.valueCountsNormalized(Tables.events(s, d), Seq("event_type"))
    }),

    "q26_agg_global" -> ((s, d) => {
      li(s, d).agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_orderkey")).as("nd_orders"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"))
    }),

    "q27_pivot" -> ((s, d) => {
      li(s, d).groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_returnflag"))
    }),

    // describe() facets as explicit aggs (SURVEY §2.4 describe →
    // df.summary(); summary() emits strings, so the gated form computes
    // the same facets typed)
    "q26b_describe" -> ((s, d) => {
      li(s, d).agg(
        count(col("l_quantity")).as("cnt"),
        round(avg(col("l_quantity")), 4).as("mean"),
        round(stddev_samp(col("l_quantity")), 4).as("std"),
        round(min(col("l_quantity")), 2).as("min_v"),
        round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
        round(max(col("l_quantity")), 2).as("max_v"))
    }),

    // salted two-phase aggregation (hot-key mitigation — Skew.saltedAgg;
    // oracle is the plain GROUP BY, proving salt-invariance)
    "q26c_salted_agg" -> ((s, d) => {
      graft.ops.Skew.saltedAgg(li(s, d), Seq("l_returnflag"), "l_quantity")
        .select(col("l_returnflag"), col("n"),
          round(col("sum_v"), 2).as("sum_v"), round(col("min_v"), 2).as("min_v"),
          round(col("max_v"), 2).as("max_v"), round(col("avg_v"), 4).as("avg_v"))
        .orderBy(col("l_returnflag"))
    }),

    // salted join (skewed-left mitigation — Skew.saltedJoin; oracle is
    // the plain join aggregate)
    "q18b_salted_join" -> ((s, d) => {
      val right = ord(s, d).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(li(s, d).select("l_orderkey", "l_quantity"), right, "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // one-hot encoding (get_dummies — SURVEY §2.4, [dask/dataframe/
    // reshape.py :: get_dummies], tested [tests/test_onehot.py])
    "q27b_onehot" -> ((s, d) => {
      ord(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("st_f"),
          when(col("o_orderstatus") === "O", 1).otherwise(0).as("st_o"),
          when(col("o_orderstatus") === "P", 1).otherwise(0).as("st_p"))
        .orderBy(col("o_orderkey"))
    }),

    // rollup/cube — bonus beyond reference surface (SURVEY §2.4)
    "q28_rollup" -> ((s, d) => {
      li(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    }),

    "q29_cube" -> ((s, d) => {
      ord(s, d).cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"))
        .orderBy(col("st"), col("pri"))
    }),

    // melt / unpivot (SURVEY §2.4 reshape)
    "q30_melt" -> ((s, d) => {
      li(s, d)
        .filter(col("l_orderkey") % 1499 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "val")
        .withColumn("val", round(col("val"), 2))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),

    // ---- §2.6 sorts / limits / distinct / set ops ----------------------
    "q31_sort_multi" -> ((s, d) => {
      li(s, d)
        .withColumn("nz_disc", nullif(col("l_discount"), lit(0.0)))
        .select(col("nz_disc"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("nz_disc").asc_nulls_first, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(500)
    }),

    "q32_topk" -> ((s, d) => {
      ord(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // grouped top-k (reference groupby.apply(nlargest) — the per-group
    // variant of q32): rank inside each group, keep k. One hash
    // exchange + in-partition sort; no per-group driver loop.
    "q32b_topk_per_group" -> ((s, d) => {
      graft.ops.FrameOps.topKPerGroup(li(s, d), Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc), 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    "q33_distinct" -> ((s, d) => {
      cust(s, d).select(col("c_mktsegment"), col("c_nationkey")).distinct()
        .orderBy(col("c_mktsegment"), col("c_nationkey"))
    }),

    "q34_dedup_keep_first" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))
    }),

    // pandas drop_duplicates(keep='last') and keep=False in one gate:
    // keep='last' takes each user's LAST event (row_number over the
    // reversed order); keep=False drops every key that occurs more
    // than once (count window == 1). Both stay one exchange per window.
    "q34c_dedup_keep_last_false" -> ((s, d) => {
      val wLast = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val nPerKey = Window.partitionBy(col("user_id"), col("event_type"))
      val last = Tables.events(s, d)
        .withColumn("rn", row_number().over(wLast))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
      val uniqueOnly = Tables.events(s, d)
        .withColumn("cnt", count(lit(1)).over(nPerKey))
        .filter(col("cnt") === 1)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_unique_types"))
      last.join(uniqueOnly, Seq("user_id"), "left")
        .na.fill(0, Seq("n_unique_types"))
        .orderBy(col("user_id"))
    }),

    // pandas duplicated(keep='first'): flag every occurrence after the
    // first of each (user_id, event_type) in event order — the
    // row-marking sibling of q34's drop
    "q34b_duplicated_flag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("duplicated", (row_number().over(w) > 1).cast("int"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("duplicated")).as("n_dup"))
        .orderBy(col("user_id"))
    }),

    "q35_union" -> ((s, d) => {
      val a = li(s, d).filter(col("l_returnflag") === "A").select(col("l_orderkey"), col("l_linenumber"))
      val b = li(s, d).filter(col("l_linestatus") === "F").select(col("l_orderkey"), col("l_linenumber"))
      a.union(b).distinct().orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // concat axis=1 (reference cudf.concat axis=1): column-wise stack
    // aligned on the index key — full-outer joins, absent rows → null
    "q35b_concat_axis1" -> ((s, d) => {
      def cnt(p: String, as: String) =
        ord(s, d).filter(col("o_orderpriority") === p)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as(as))
      graft.ops.FrameOps.concatAxis1(
          Seq(cnt("1-URGENT", "n_urgent"), cnt("2-HIGH", "n_high"),
            cnt("5-LOW", "n_low")), "o_custkey")
        .orderBy(col("o_custkey"))
    }),

    "q36_intersect" -> ((s, d) => {
      val a = ord(s, d).filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      val b = ord(s, d).filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    }),

    "q37_except" -> ((s, d) => {
      val a = ord(s, d).filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      val b = ord(s, d).filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
      a.except(b).orderBy(col("o_custkey"))
    }),

    "q38_limit_offset" -> ((s, d) => {
      ord(s, d).select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
        .offset(100).limit(50)
    }),

    // random sample — engine-specific RNG, rows-only check (no oracle)
    "q39_sample" -> ((s, d) => {
      li(s, d).sample(withReplacement = false, fraction = 0.1, seed = 42)
        .select(col("l_orderkey"), col("l_linenumber"))
    }),

    // exact-n deterministic sample (NEW r8; dask sample(n=) RAISES —
    // beyond-reference): draw n rows by global order on a keyed md5 —
    // reproducible across engines and runs, hash-gated unlike q39's
    // engine RNG. (hk, price) is unique because the 5-col key is.
    "q39b_sample_n" -> ((s, d) => {
      li(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
        .withColumn("hk", md5(concat_ws("-", col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))
        .orderBy(col("hk"), col("l_extendedprice"))
        .limit(500)
        .drop("hk")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
    }),

    // population stats + higher moments (reference Series.skew/kurt,
    // std(ddof=0) — SURVEY §2.4). Spark's skewness/kurtosis are the
    // population (g1/g2-excess) definitions.
    "q20b_pop_stats" -> ((s, d) => {
      // + 0.0 collapses IEEE −0.0 (a tiny negative skewness rounds to
      // −0.0 in DuckDB but 0.0 in Spark — surfaced at sf0.001)
      li(s, d).groupBy(col("l_returnflag"))
        .agg(
          (round(stddev_pop(col("l_quantity")), 4) + lit(0.0)).as("std_pop_qty"),
          (round(var_pop(col("l_quantity")), 4) + lit(0.0)).as("var_pop_qty"),
          (round(covar_pop(col("l_quantity"), col("l_discount")), 6) + lit(0.0)).as("cov_pop"),
          (round(skewness(col("l_quantity")), 4) + lit(0.0)).as("skew_qty"),
          (round(kurtosis(col("l_quantity")), 4) + lit(0.0)).as("kurt_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // full pairwise corr/cov matrix (reference DataFrame.corr/cov — all
    // pairs): 10 upper-triangle pairs of 4 lineitem measures in ONE
    // single-pass aggregation (no self-join), exploded to long form
    "q20c_corr_matrix" -> ((s, d) => {
      graft.ops.FrameOps.corrMatrix(li(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        // + 0.0 collapses IEEE −0.0 (a tiny negative covariance rounds
        // to −0.0 in DuckDB but 0.0 in Spark — hash-relevant)
        .select(col("col_a"), col("col_b"),
          (round(col("corr"), 6) + lit(0.0)).as("corr"),
          (round(col("cov"), 4) + lit(0.0)).as("cov"))
        .orderBy(col("col_a"), col("col_b"))
    }),

    // mode with a deterministic tiebreak (reference Series.mode):
    // argmax count, ties broken by min value — plain count+window, no
    // nondeterministic built-in
    "q24b_mode" -> ((s, d) => {
      graft.ops.FrameOps.modePerGroup(ord(s, d), Seq("o_orderpriority"),
          "o_orderstatus", as = "mode_status")
        .orderBy(col("o_orderpriority"))
    }),

    // fixed-width binning (reference cudf.cut with explicit bounds);
    // bin id is pure arithmetic so it runs inside the scan's codegen
    // stage — no bucketizer state, no shuffle beyond the count agg
    "q25b_binning" -> ((s, d) => {
      li(s, d)
        .withColumn("bin", floor(col("l_extendedprice") / 10000).cast("int"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), round(avg(col("l_extendedprice")), 2).as("avg_price"))
        .orderBy(col("bin"))
    }),

    // pandas qcut: quantile binning via ntile over a TOTAL order (the
    // orderkey tiebreak makes boundary assignment engine-deterministic)
    "q25c_qcut" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      ord(s, d).withColumn("tile", ntile(4).over(w))
        .groupBy(col("o_orderpriority"), col("tile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("o_orderpriority"), col("tile"))
    }),

    // two-way frequency table (reference cudf.crosstab / DataFrame
    // .stat.crosstab) — zero-filled counts per category pair
    "q27c_crosstab" -> ((s, d) => {
      li(s, d).stat.crosstab("l_returnflag", "l_linestatus")
        .select(col("l_returnflag_l_linestatus").as("rf"),
          col("F").as("n_f"), col("O").as("n_o"))
        .orderBy(col("rf"))
    }),

    // dropna variants (reference dropna(how='any'/'all', thresh)) over
    // deterministically synthesized nulls
    "q04c_dropna_thresh" -> ((s, d) => {
      val g = li(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("a"),
          nullif(col("l_tax"), lit(0.0)).as("b"),
          nullif(col("l_quantity") % 5, lit(0.0)).as("c"))
      val nNulls = (0 to 2).map(i => when(col(Seq("a", "b", "c")(i)).isNull, 1).otherwise(0))
        .reduce(_ + _)
      g.withColumn("n_nulls", nNulls)
        .filter(col("n_nulls") <= 1) // thresh: keep rows with ≥2 non-null
        .select(col("l_orderkey"), col("l_linenumber"), col("a"), col("b"), col("c"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("a"), col("b"), col("c"))
    }),

    // interleave_columns + tile (reference cudf.core.reshape
    // [cpp/src/reshape/interleave_columns.cu, tile.cu]): row-major
    // round-robin of columns, and whole-frame repetition — both are
    // explode over a built array, so they stay narrow transforms
    "q30b_interleave_tile" -> ((s, d) => {
      li(s, d)
        .filter(col("l_orderkey") % 1499 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          posexplode(array(round(col("l_quantity"), 2), round(col("l_discount"), 2),
            round(col("l_tax"), 2))).as(Seq("src", "v")))
        .unionAll(
          li(s, d).filter(col("l_orderkey") % 1499 === 0)
            .select(col("l_orderkey"), col("l_linenumber"),
              posexplode(array_repeat(round(col("l_quantity"), 2), 2))
                .as(Seq("rep", "vv")))
            .select(col("l_orderkey"), col("l_linenumber"),
              (col("rep") + 10).as("src"), col("vv").as("v")))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("src"))
    }),

    // factorize / categorical codes (reference Series.factorize,
    // cudf Categorical): codes from the distinct dimension, broadcast
    // back — the global sort touches only the tiny distinct set, never
    // the fact table, so the shape holds at 100 TB
    "q33b_factorize" -> ((s, d) => {
      graft.ops.FrameOps.factorize(
          ord(s, d).filter(col("o_orderkey") % 149 === 0), "o_orderpriority", "pri_code")
        .select(col("o_orderkey"), col("o_orderpriority"), col("pri_code"))
        .orderBy(col("o_orderkey"))
    }),

    // groupby.ngroup() (pandas sort=True): dense 0-based group index in
    // key-sorted order; numbering on the distinct-key frame, broadcast
    // back (FrameOps.ngroup — factorize's shape, multi-key)
    "q33c_ngroup" -> ((s, d) => {
      graft.ops.FrameOps.ngroup(
          ord(s, d).filter(col("o_orderkey") % 149 === 0),
          Seq("o_orderpriority", "o_orderstatus"), "grp")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"), col("grp"))
        .orderBy(col("o_orderkey"))
    }),

    // Series.autocorr(lag=1): Pearson corr of the series with its own
    // lag, per user. Pair-complete frame first (drop the leading null
    // pair), then the cov/(sx·sy) ratio — nullif instead of corr() so a
    // zero-variance group yields null like DuckDB/pandas instead of
    // throwing under Spark 4 ANSI
    "q20d_autocorr" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .withColumn("prev", lag(col("value"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("user_id"))
        .agg(round(covar_samp(col("value"), col("prev")) /
            nullif(stddev_samp(col("value")) * stddev_samp(col("prev")), lit(0.0)), 6)
          .as("autocorr_1"),
          count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // groupby.filter (pandas filter(lambda g: ...)): keep all rows of
    // groups whose aggregate qualifies — agg + left-semi join, no
    // unordered window (FrameOps.groupbyFilter)
    "q26e_groupby_filter" -> ((s, d) => {
      graft.ops.FrameOps.groupbyFilter(
          Tables.events(s, d).filter(col("user_id") % 9 === 0)
            .select(col("user_id"), col("event_id"), col("value")),
          Seq("user_id"), count(lit(1)), col("__agg") >= 65)
        .orderBy(col("user_id"), col("event_id"))
    }),

    // stack/unstack round-trip (pandas unstack = inverse of melt/stack):
    // melt two measures to long, unstack back to wide — identity, so the
    // oracle is the plain projection (FrameOps.melt + FrameOps.unstack)
    "q27d_stack_unstack" -> ((s, d) => {
      val base = ord(s, d).filter(col("o_orderkey") % 149 === 0)
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"),
          col("o_custkey").cast("double").as("custkey_d"))
      val long = graft.ops.FrameOps.melt(
        base, Seq("o_orderkey"), Seq("totalprice", "custkey_d"))
      graft.ops.FrameOps.unstack(long, Seq("o_orderkey"), "variable",
          Seq("totalprice", "custkey_d"))
        .orderBy(col("o_orderkey"))
    }),

    // DataFrame.T (cudf transpose, summary-sized frames): per-flag stats
    // transposed so stats are rows and flags are columns
    // (FrameOps.transpose — melt + bounded pivot)
    "q26d_transpose" -> ((s, d) => {
      val stats = li(s, d).groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("n"))
      graft.ops.FrameOps.transpose(stats, "l_returnflag", Seq("A", "N", "R"))
        .orderBy(col("variable"))
    }),

    // Series.searchsorted(side='left'): insertion index of each probe
    // (customer acctbal) into the sorted element series (supplier
    // acctbal) — merge-based union + running element count
    // (FrameOps.searchSorted)
    "q31b_searchsorted" -> ((s, d) => {
      graft.ops.FrameOps.searchSorted(
          Tables.supplier(s, d), "s_acctbal",
          cust(s, d).filter(col("c_custkey") % 97 === 0), "c_acctbal",
          "c_custkey", "ins_idx")
        .orderBy(col("c_custkey"))
    }),

    // the scale path: distributed prefix scan (range partition +
    // partition-local running count + broadcast offsets) — 8 partitions
    // forced so the gate exercises real cross-partition offsets; shares
    // q31b's oracle verbatim
    "q31c_searchsorted_large" -> ((s, d) => {
      graft.ops.FrameOps.searchSortedLarge(
          Tables.supplier(s, d), "s_acctbal",
          cust(s, d).filter(col("c_custkey") % 97 === 0), "c_acctbal",
          "c_custkey", "ins_idx", numParts = 8)
        .orderBy(col("c_custkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q33c_ngroup" ->
      """SELECT o_orderkey, o_orderpriority, o_orderstatus,
        |  DENSE_RANK() OVER (ORDER BY o_orderpriority, o_orderstatus) - 1 AS grp
        |FROM orders WHERE o_orderkey % 149 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q20d_autocorr" ->
      """WITH lagged AS (
        |  SELECT user_id, value,
        |    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events WHERE user_id % 9 = 0)
        |SELECT user_id,
        |  ROUND(COVAR_SAMP(value, prev) /
        |    NULLIF(STDDEV_SAMP(value) * STDDEV_SAMP(prev), 0.0), 6) AS autocorr_1,
        |  COUNT(*) AS n_pairs
        |FROM lagged WHERE prev IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q26e_groupby_filter" ->
      """SELECT user_id, event_id, value FROM events
        |WHERE user_id % 9 = 0 AND user_id IN (
        |  SELECT user_id FROM events WHERE user_id % 9 = 0
        |  GROUP BY user_id HAVING COUNT(*) >= 65)
        |ORDER BY user_id, event_id""".stripMargin,

    "q27d_stack_unstack" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
        |  CAST(o_custkey AS DOUBLE) AS custkey_d
        |FROM orders WHERE o_orderkey % 149 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "q26d_transpose" ->
      """WITH s AS (
        |  SELECT l_returnflag AS f, ROUND(SUM(l_quantity), 2) AS sum_qty,
        |    ROUND(AVG(l_discount), 4) AS avg_disc,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT 'sum_qty' AS variable,
        |  MAX(CASE WHEN f = 'A' THEN sum_qty END) AS A,
        |  MAX(CASE WHEN f = 'N' THEN sum_qty END) AS N,
        |  MAX(CASE WHEN f = 'R' THEN sum_qty END) AS R FROM s
        |UNION ALL
        |SELECT 'avg_disc',
        |  MAX(CASE WHEN f = 'A' THEN avg_disc END),
        |  MAX(CASE WHEN f = 'N' THEN avg_disc END),
        |  MAX(CASE WHEN f = 'R' THEN avg_disc END) FROM s
        |UNION ALL
        |SELECT 'n',
        |  MAX(CASE WHEN f = 'A' THEN n END),
        |  MAX(CASE WHEN f = 'N' THEN n END),
        |  MAX(CASE WHEN f = 'R' THEN n END) FROM s
        |ORDER BY variable""".stripMargin,

    "q31b_searchsorted" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT COUNT(*) FROM supplier e WHERE e.s_acctbal < p.c_acctbal) AS ins_idx
        |FROM customer p WHERE c_custkey % 97 = 0
        |ORDER BY c_custkey""".stripMargin,

    "q31c_searchsorted_large" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT COUNT(*) FROM supplier e WHERE e.s_acctbal < p.c_acctbal) AS ins_idx
        |FROM customer p WHERE c_custkey % 97 = 0
        |ORDER BY c_custkey""".stripMargin,

    "q01b_sql_entry" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q10b_sql_join" ->
      """SELECT n.n_name, COUNT(*) AS n_suppliers
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,

    "q01_agg_tpch1" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |  ROUND(AVG(l_discount), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 10
        |  AND l_returnflag IN ('A','R') AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_arith_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(l_extendedprice * (1 - l_discount), 2) AS disc_price,
        |  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS floordiv7,
        |  ((l_linenumber % 3) + 3) % 3 AS mod3,
        |  ROUND(SQRT(l_extendedprice), 4) AS sqrt_price,
        |  ROUND(LN(l_extendedprice), 6) AS ln_price,
        |  ROUND(EXP(l_discount), 6) AS exp_disc,
        |  ROUND(POW(l_quantity, 2), 2) AS qty_sq,
        |  CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  ABS(l_quantity * -1) AS abs_qty
        |FROM lineitem WHERE l_orderkey % 997 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_null_ops" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(NULLIF(l_discount, 0.0)) AS n_nonzero_disc,
        |  CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_disc,
        |  ROUND(SUM(COALESCE(NULLIF(l_discount, 0.0), 0.01)), 2) AS filled_sum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q05_when_clip" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity > 25 THEN 'hi' WHEN l_quantity > 10 THEN 'mid' ELSE 'lo' END AS bucket,
        |  ROUND(LEAST(GREATEST(l_extendedprice, 1000.0), 50000.0), 2) AS clipped
        |FROM lineitem WHERE l_orderkey % 503 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q06_casts" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  STRFTIME(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_date,
        |  CAST(l_linenumber AS DOUBLE) AS ln_dbl,
        |  CAST(l_quantity > 20 AS INTEGER) AS gt20
        |FROM lineitem WHERE l_orderkey % 1499 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q07_decimal" ->
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
        |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) * 10000 // COUNT(*) AS BIGINT) AS avg_qty_u6,
        |  CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS min_price,
        |  CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS max_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q10_join_inner" ->
      """SELECT o_orderpriority,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q11_join_left" ->
      """SELECT o_orderstatus, COUNT(*) AS n, COUNT(c.c_custkey) AS matched
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q12_join_right" ->
      """SELECT o_orderstatus, COUNT(*) AS n, COUNT(c.c_custkey) AS matched
        |FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  RIGHT JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q13_join_full" ->
      """SELECT COUNT(*) AS n, COUNT(a.k) AS n_left, COUNT(b.k2) AS n_right
        |FROM (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F') a
        |FULL OUTER JOIN (SELECT DISTINCT l_orderkey AS k2 FROM lineitem WHERE l_returnflag = 'R') b
        |  ON a.k = b.k2
        |ORDER BY n""".stripMargin,

    "q13c_merge_indicator" ->
      """SELECT CASE WHEN a.k IS NOT NULL AND b.k2 IS NOT NULL THEN 'both'
        |            WHEN a.k IS NOT NULL THEN 'left_only'
        |            ELSE 'right_only' END AS _merge, COUNT(*) AS n
        |FROM (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F') a
        |FULL OUTER JOIN (SELECT DISTINCT l_orderkey AS k2 FROM lineitem WHERE l_returnflag = 'R') b
        |  ON a.k = b.k2
        |GROUP BY 1 ORDER BY _merge""".stripMargin,

    "q04d_combine_first" ->
      """WITH base AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 298 = 0 THEN NULL ELSE o_totalprice END AS price,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END AS prio
        |  FROM orders WHERE o_orderkey % 149 = 0),
        |other AS (SELECT o_orderkey, ROUND(o_totalprice * 2, 2) AS p2,
        |    'FALLBACK' AS q2
        |  FROM orders WHERE o_orderkey % 149 = 0)
        |SELECT b.o_orderkey, COALESCE(b.price, o.p2) AS price,
        |  COALESCE(b.prio, o.q2) AS prio
        |FROM base b LEFT JOIN other o ON b.o_orderkey = o.o_orderkey
        |ORDER BY b.o_orderkey""".stripMargin,

    "q212_cdc_merge" ->
      """WITH cust AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey
        |  FROM customer),
        |t AS (SELECT * FROM cust WHERE c_custkey % 3 = 0),
        |ch AS (
        |  SELECT c_custkey, 1 AS v, 'U' AS op, c_name,
        |    c_acctbal + 111 AS c_acctbal, c_nationkey FROM t
        |  UNION ALL
        |  SELECT c_custkey, 2 AS v,
        |    CASE WHEN c_custkey % 9 = 0 THEN 'D' ELSE 'U' END AS op,
        |    c_name, c_acctbal + 555 AS c_acctbal, c_nationkey FROM t),
        |latest AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY c_custkey ORDER BY v DESC) AS rn FROM ch)
        |  WHERE rn = 1),
        |untouched AS (SELECT c.* FROM cust c WHERE NOT EXISTS
        |  (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)),
        |ups AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey
        |  FROM latest WHERE op = 'U'),
        |merged AS (SELECT * FROM untouched UNION ALL SELECT * FROM ups)
        |SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
        |  c_nationkey
        |FROM merged ORDER BY c_custkey""".stripMargin,

    "q239_snapshot_at" ->
      // q212's fold with the log truncated at v <= 1: only the +111
      // updates exist at that version — no deletes, no +555
      """WITH cust AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey
        |  FROM customer),
        |t AS (SELECT * FROM cust WHERE c_custkey % 3 = 0),
        |ch AS (
        |  SELECT c_custkey, 1 AS v, 'U' AS op, c_name,
        |    c_acctbal + 111 AS c_acctbal, c_nationkey FROM t
        |  UNION ALL
        |  SELECT c_custkey, 2 AS v,
        |    CASE WHEN c_custkey % 9 = 0 THEN 'D' ELSE 'U' END AS op,
        |    c_name, c_acctbal + 555 AS c_acctbal, c_nationkey FROM t),
        |kept AS (SELECT * FROM ch WHERE v <= 1),
        |latest AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY c_custkey ORDER BY v DESC) AS rn FROM kept)
        |  WHERE rn = 1),
        |untouched AS (SELECT c.* FROM cust c WHERE NOT EXISTS
        |  (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)),
        |ups AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey
        |  FROM latest WHERE op = 'U'),
        |merged AS (SELECT * FROM untouched UNION ALL SELECT * FROM ups)
        |SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
        |  c_nationkey
        |FROM merged ORDER BY c_custkey""".stripMargin,

    "q14_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q15_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q16_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q17_join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q18_join_multikey" ->
      """SELECT a.l_orderkey, a.l_linenumber,
        |  ROUND(a.l_extendedprice + b.l_extendedprice, 2) AS pair_price
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
        |ORDER BY a.l_orderkey, a.l_linenumber""".stripMargin,

    "q19_join_nonequi" ->
      """SELECT n1.n_name AS name1, COUNT(*) AS n_larger
        |FROM nation n1 JOIN nation n2
        |  ON n2.n_nationkey > n1.n_nationkey AND n1.n_regionkey = n2.n_regionkey
        |GROUP BY n1.n_name ORDER BY name1""".stripMargin,

    "q08_join_tpch3" ->
      """SELECT l_orderkey,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q09_join_tpch5" ->
      """SELECT n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q09b_join_tpch18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING ROUND(SUM(l_quantity), 2) > 250) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

    "q20_agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
        |  ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        |  ROUND(STDDEV_SAMP(l_discount), 6) AS std_disc,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q21_agg_countdistinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the estimate itself is engine-specific; the gated columns are the
    "q192_hist_quantile" -> {
      import graft.ops.Sketches
      val (lo, hi, nb) = (0.0, 110000.0, 64)
      s"""WITH vals AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |h AS (SELECT ${Sketches.histBucketExpr(lo, hi, nb)} AS bucket,
         |    COUNT(*) AS cnt FROM vals GROUP BY 1),
         |c AS (SELECT bucket, cnt, CAST(SUM(cnt) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cume FROM h),
         |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
         |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
         |    CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q)
         |SELECT q, n, ${Sketches.histEstExpr(lo, hi, nb)} AS est
         |FROM qs CROSS JOIN t JOIN c
         |  ON cume >= CAST(CEIL(q * n) AS BIGINT)
         |  AND cume - cnt < CAST(CEIL(q * n) AS BIGINT)
         |ORDER BY q""".stripMargin
    },

    // exact count and the ≤5%-relative-error flag (expected always 1)
    "q21b_agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_nd,
        |  CAST(1 AS INTEGER) AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q21c_agg_hll_sketch" ->
      """SELECT grp, exact_nd, CAST(1 AS INTEGER) AS ok FROM (
        |  SELECT l_linestatus AS grp, COUNT(DISTINCT l_partkey) AS exact_nd FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL', COUNT(DISTINCT l_partkey) FROM lineitem)
        |ORDER BY grp""".stripMargin,

    "q21d_cms_estimate" ->
      """WITH a AS (SELECT CAST(j AS INTEGER) AS j,
        |    (2654435761 * (j + 1)) % 2147483647 AS aj,
        |    (40503 * (j + 1) * (j + 1) + 7) % 2147483647 AS bj
        |  FROM range(4) t(j)),
        |sk AS (SELECT j,
        |    ((aj * (user_id % 2147483647) + bj) % 2147483647) % 64 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM events CROSS JOIN a GROUP BY 1, 2),
        |pr AS (SELECT DISTINCT user_id FROM events WHERE user_id % 25 = 0),
        |pb AS (SELECT user_id, j,
        |    ((aj * (user_id % 2147483647) + bj) % 2147483647) % 64 AS bucket
        |  FROM pr CROSS JOIN a),
        |est AS (SELECT user_id, MIN(COALESCE(cnt, 0)) AS cms_est
        |  FROM pb LEFT JOIN sk USING (j, bucket) GROUP BY user_id),
        |ex AS (SELECT user_id, COUNT(*) AS exact_cnt FROM events
        |  WHERE user_id % 25 = 0 GROUP BY user_id)
        |SELECT user_id, cms_est, exact_cnt FROM est JOIN ex USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q211_cms_join_size" -> {
      def one(w: Int) =
        s"""(WITH a AS (SELECT CAST(j AS INTEGER) AS j,
           |    (2654435761 * (j + 1)) % 2147483647 AS aj,
           |    (40503 * (j + 1) * (j + 1) + 7) % 2147483647 AS bj
           |  FROM range(4) t(j)),
           |sa AS (SELECT j,
           |    ((aj * (o_orderkey % 2147483647) + bj) % 2147483647) % $w AS bucket,
           |    COUNT(*) AS cnt
           |  FROM orders CROSS JOIN a GROUP BY 1, 2),
           |sb AS (SELECT j,
           |    ((aj * (l_orderkey % 2147483647) + bj) % 2147483647) % $w AS bucket,
           |    COUNT(*) AS cnt_b
           |  FROM lineitem CROSS JOIN a GROUP BY 1, 2),
           |dots AS (SELECT sa.j, CAST(SUM(sa.cnt * sb.cnt_b) AS BIGINT) AS dot
           |  FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
           |  GROUP BY sa.j)
           |SELECT $w AS width, MIN(dot) AS join_size_est FROM dots)""".stripMargin
      s"""WITH est AS (${one(64)} UNION ALL ${one(16384)}),
         |ex AS (SELECT COUNT(*) AS exact_size FROM orders
         |  JOIN lineitem ON o_orderkey = l_orderkey)
         |SELECT width, join_size_est, exact_size,
         |  CAST(join_size_est >= exact_size AS INTEGER) AS never_under
         |FROM est CROSS JOIN ex ORDER BY width""".stripMargin
    },

    "q21e_cms_weighted" ->
      """WITH a AS (SELECT CAST(j AS INTEGER) AS j,
        |    (2654435761 * (j + 1)) % 2147483647 AS aj,
        |    (40503 * (j + 1) * (j + 1) + 7) % 2147483647 AS bj
        |  FROM range(4) t(j)),
        |ew AS (SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS w
        |  FROM events),
        |sk AS (SELECT j,
        |    ((aj * (user_id % 2147483647) + bj) % 2147483647) % 64 AS bucket,
        |    CAST(SUM(w) AS BIGINT) AS cnt
        |  FROM ew CROSS JOIN a GROUP BY 1, 2),
        |pr AS (SELECT DISTINCT user_id FROM ew WHERE user_id % 25 = 0),
        |pb AS (SELECT user_id, j,
        |    ((aj * (user_id % 2147483647) + bj) % 2147483647) % 64 AS bucket
        |  FROM pr CROSS JOIN a),
        |est AS (SELECT user_id, MIN(COALESCE(cnt, 0)) AS cms_w
        |  FROM pb LEFT JOIN sk USING (j, bucket) GROUP BY user_id),
        |ex AS (SELECT user_id, CAST(SUM(w) AS BIGINT) AS exact_w FROM ew
        |  WHERE user_id % 25 = 0 GROUP BY user_id)
        |SELECT user_id, cms_w, exact_w FROM est JOIN ex USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q22_agg_collect" ->
      """SELECT o_orderpriority,
        |  ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q23_agg_quantile" ->
      """SELECT l_returnflag,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.25), 4) AS q25,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS q50,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.75), 4) AS q75,
        |  ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // sketch estimates are engine-specific; gated columns are the exact
    // quantiles and the ≤2%-relative-error flag (expected always 1)
    "q23b_approx_quantile" ->
      """SELECT l_returnflag,
        |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS exact_q50,
        |  ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS exact_p90,
        |  CAST(1 AS INTEGER) AS ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_agg_argminmax" ->
      """SELECT o_orderpriority,
        |  MAX_BY(o_custkey, o_orderkey) AS last_cust,
        |  MIN_BY(o_custkey, o_orderkey) AS first_cust,
        |  MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q25_value_counts" ->
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin,

    "q25d_value_counts_norm" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS frac
        |FROM events GROUP BY event_type
        |ORDER BY frac DESC, event_type""".stripMargin,

    "q26_agg_global" ->
      """SELECT COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price,
        |  ROUND(AVG(l_quantity), 4) AS avg_qty,
        |  MIN(l_shipdate) AS min_ship,
        |  MAX(l_shipdate) AS max_ship,
        |  COUNT(DISTINCT l_orderkey) AS nd_orders,
        |  ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cov_qty_disc
        |FROM lineitem""".stripMargin,

    "q20c_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val rows = for { i <- cs.indices; j <- cs.indices if i <= j } yield {
        val (a, b) = (cs(i), cs(j))
        s"SELECT '$a' AS col_a, '$b' AS col_b, " +
          s"ROUND(CORR($a, $b), 6) + 0.0 AS corr, " +
          s"ROUND(COVAR_SAMP($a, $b), 4) + 0.0 AS cov FROM lineitem"
      }
      rows.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
    },

    "q04b_value_replace" ->
      """SELECT o_orderkey,
        |  CASE o_orderpriority WHEN '1-URGENT' THEN 'P1' WHEN '2-HIGH' THEN 'P2'
        |       WHEN '3-MEDIUM' THEN 'P3' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q26b_describe" ->
      """SELECT COUNT(l_quantity) AS cnt,
        |  ROUND(AVG(l_quantity), 4) AS mean,
        |  ROUND(STDDEV_SAMP(l_quantity), 4) AS std,
        |  ROUND(MIN(l_quantity), 2) AS min_v,
        |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  ROUND(MAX(l_quantity), 2) AS max_v
        |FROM lineitem""".stripMargin,

    "q26c_salted_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_v,
        |  ROUND(MIN(l_quantity), 2) AS min_v,
        |  ROUND(MAX(l_quantity), 2) AS max_v,
        |  ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_v
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q18b_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q27b_onehot" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS st_f,
        |  CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS st_o,
        |  CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS st_p
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q27_pivot" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F",
        |  ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q29_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
        |  COALESCE(o_orderpriority, 'ALL') AS pri,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin,

    "q30_melt" ->
      """SELECT l_orderkey, l_linenumber, metric, ROUND(val, 2) AS val
        |FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q31_sort_multi" ->
      """SELECT NULLIF(l_discount, 0.0) AS nz_disc, l_orderkey, l_linenumber
        |FROM lineitem
        |ORDER BY nz_disc ASC NULLS FIRST, l_orderkey ASC, l_linenumber ASC
        |LIMIT 500""".stripMargin,

    "q32_topk" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q33_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q34_dedup_keep_first" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q34c_dedup_keep_last_false" ->
      """WITH last AS (
        |  SELECT user_id, event_id, event_type FROM (
        |    SELECT user_id, event_id, event_type,
        |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1),
        |uo AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_unique_types FROM (
        |    SELECT user_id, event_type,
        |      COUNT(*) OVER (PARTITION BY user_id, event_type) AS cnt
        |    FROM events) WHERE cnt = 1 GROUP BY user_id)
        |SELECT l.user_id, l.event_id, l.event_type,
        |  COALESCE(uo.n_unique_types, 0) AS n_unique_types
        |FROM last l LEFT JOIN uo ON l.user_id = uo.user_id
        |ORDER BY l.user_id""".stripMargin,

    "q34b_duplicated_flag" ->
      """SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |FROM (
        |  SELECT user_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q35_union" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'A'
        |UNION
        |SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q35b_concat_axis1" ->
      """WITH u AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |h AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_high
        |  FROM orders WHERE o_orderpriority = '2-HIGH' GROUP BY 1),
        |l AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_low
        |  FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        |SELECT o_custkey, n_urgent, n_high, n_low
        |FROM u FULL JOIN h USING (o_custkey) FULL JOIN l USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q36_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,

    "q37_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,

    "q38_limit_offset" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin,

    "q39b_sample_n" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
        |FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
        |    md5(CONCAT_WS('-', l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS hk
        |  FROM lineitem ORDER BY hk, l_extendedprice LIMIT 500)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""".stripMargin,

    // DuckDB skewness is the sample G1; Spark's is population g1 =
    // G1 * (n-2) / sqrt(n*(n-1)). kurtosis_pop matches Spark directly.
    "q20b_pop_stats" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_POP(l_quantity), 4) + 0.0 AS std_pop_qty,
        |  ROUND(VAR_POP(l_quantity), 4) + 0.0 AS var_pop_qty,
        |  ROUND(COVAR_POP(l_quantity, l_discount), 6) + 0.0 AS cov_pop,
        |  ROUND(SKEWNESS(l_quantity) * (COUNT(*) - 2) / SQRT(COUNT(*) * (COUNT(*) - 1.0)), 4) + 0.0 AS skew_qty,
        |  ROUND(KURTOSIS_POP(l_quantity), 4) + 0.0 AS kurt_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24b_mode" ->
      """SELECT o_orderpriority, o_orderstatus AS mode_status, cnt FROM (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |      ORDER BY COUNT(*) DESC, o_orderstatus ASC) AS rn
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus
        |) WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,

    "q25b_binning" ->
      """SELECT CAST(FLOOR(l_extendedprice / 10000) AS INTEGER) AS bin,
        |  COUNT(*) AS n, ROUND(AVG(l_extendedprice), 2) AS avg_price
        |FROM lineitem GROUP BY bin ORDER BY bin""".stripMargin,

    "q25c_qcut" ->
      """SELECT o_orderpriority, tile, COUNT(*) AS n,
        |  ROUND(MIN(o_totalprice), 2) AS lo, ROUND(MAX(o_totalprice), 2) AS hi
        |FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS tile
        |  FROM orders
        |) GROUP BY o_orderpriority, tile
        |ORDER BY o_orderpriority, tile""".stripMargin,

    "q27c_crosstab" ->
      """SELECT l_returnflag AS rf,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY rf""".stripMargin,

    "q32b_topk_per_group" ->
      """SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, l_orderkey, l_linenumber, price FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    ROUND(l_extendedprice, 2) AS price,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        |  FROM lineitem
        |) WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,

    "q04c_dropna_thresh" ->
      """SELECT l_orderkey, l_linenumber, a, b, c FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    NULLIF(l_discount, 0.0) AS a, NULLIF(l_tax, 0.0) AS b,
        |    NULLIF(l_quantity % 5, 0.0) AS c
        |  FROM lineitem WHERE l_orderkey % 331 = 0)
        |WHERE (CASE WHEN a IS NULL THEN 1 ELSE 0 END
        |     + CASE WHEN b IS NULL THEN 1 ELSE 0 END
        |     + CASE WHEN c IS NULL THEN 1 ELSE 0 END) <= 1
        |ORDER BY l_orderkey, l_linenumber, a, b, c""".stripMargin,

    "q30b_interleave_tile" ->
      """SELECT l_orderkey, l_linenumber, src, v FROM (
        |  SELECT l_orderkey, l_linenumber, 0 AS src, ROUND(l_quantity, 2) AS v
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 1, ROUND(l_discount, 2)
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 2, ROUND(l_tax, 2)
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 10, ROUND(l_quantity, 2)
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |  UNION ALL SELECT l_orderkey, l_linenumber, 11, ROUND(l_quantity, 2)
        |    FROM lineitem WHERE l_orderkey % 1499 = 0
        |) ORDER BY l_orderkey, l_linenumber, src""".stripMargin,

    "q33b_factorize" ->
      """SELECT o.o_orderkey, o.o_orderpriority, c.pri_code
        |FROM orders o JOIN (
        |  SELECT o_orderpriority,
        |    CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority) - 1 AS INTEGER) AS pri_code
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders)
        |) c USING (o_orderpriority)
        |WHERE o.o_orderkey % 149 = 0 ORDER BY o.o_orderkey""".stripMargin
  )
}
