package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window surface — SURVEY.md §2.5: rolling (row-count + time-range),
  * cumulative, shift/diff, rank. Reference anchors: dask
  * [dask/dataframe/rolling.py :: Rolling, map_overlap] (halo exchange),
  * cudf kernel [cpp/src/rolling/rolling.cu], rank [cpp/src/sort/rank.cu].
  *
  * The reference implements rolling via map_overlap (each partition gets
  * window-1 halo rows from its neighbor); Spark's Window operator handles
  * the partition-boundary problem internally via range repartitioning —
  * at 100 TB the equivalent plan is a single Exchange(hash user_id) +
  * in-partition sort, no halo plumbing.
  */
object WindowQueries extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // ranking family: rank/dense_rank allow ties; row_number needs a
    // total order to stay deterministic
    "q70_window_rank" -> ((s, d) => {
      val byQty = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val total = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          rank().over(byQty).as("rnk"),
          dense_rank().over(byQty).as("drnk"),
          round(percent_rank().over(byQty), 6).as("prnk"),
          row_number().over(total).as("rn"),
          ntile(4).over(total).as("quartile"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    // cumulative distribution (pandas rank(pct=True)-adjacent): ties
    // share the peer-inclusive value, so the output is deterministic
    "q70c_cume_dist" -> ((s, d) => {
      val byQty = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          round(cume_dist().over(byQty), 6).as("cd"))
        .orderBy(col("l_returnflag"), col("l_quantity"),
          col("l_orderkey"), col("l_linenumber"))
    }),

    // fixed row-count rolling window (reference rolling(window=3))
    "q71_window_rolling" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          round(avg(col("value")).over(w), 4).as("roll_avg"),
          round(sum(col("value")).over(w), 2).as("roll_sum"),
          round(min(col("value")).over(w), 2).as("roll_min"),
          round(max(col("value")).over(w), 2).as("roll_max"),
          count(lit(1)).over(w).as("roll_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling dispersion (reference rolling.std/var — sample ddof=1,
    // the pandas default); windows shorter than 2 give null on both
    // engines. r9: migrated off ROUND(double window agg, 6) — the q72d
    // failure class — onto the exact integer-cents moment pattern:
    // the window sums are exact BIGINTs in both engines and the final
    // cast→div→sqrt sequence is IEEE-identical, so no rounding is
    // needed at all
    "q71c_rolling_std" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-4, 0)
      val x = round(col("value") * 100, 0).cast("long")
      val cnt = count(lit(1)).over(w)
      val sx = sum(x).over(w)
      val sxx = sum(x * x).over(w)
      val dxx = cnt * sxx - sx * sx
      val denom = (cnt * (cnt - 1)).cast("double")
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          when(cnt >= 2,
            sqrt(dxx.cast("double") / denom) / lit(100.0)).as("roll_std"),
          when(cnt >= 2,
            dxx.cast("double") / denom / lit(10000.0)).as("roll_var"),
          cnt.as("roll_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling pairwise stats (pandas rolling(5).corr(other)/cov(other)):
    // Pearson corr + sample cov between two series over the same row
    // frame. r9: migrated to the q72d integer-moment pattern — exact
    // BIGINT window sums, corr/cov as one identical IEEE op sequence
    // in both engines, no ROUND. The dxx/dyy > 0 guards reproduce the
    // null contract of the old nullif(sx*sy, 0) form (constant frames
    // and single-row frames → null in both engines; Spark 4 ANSI
    // corr() would THROW there, which is why corr is never called)
    "q71d_rolling_corr_cov" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-4, 0)
      val x = round(col("value") * 100, 0).cast("long")
      val y = (col("event_id") % 17).cast("long")
      val cnt = count(lit(1)).over(w)
      val sx = sum(x).over(w)
      val sy = sum(y).over(w)
      val sxy = sum(x * y).over(w)
      val sxx = sum(x * x).over(w)
      val syy = sum(y * y).over(w)
      val num = cnt * sxy - sx * sy
      val dxx = cnt * sxx - sx * sx
      val dyy = cnt * syy - sy * sy
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          when(cnt >= 2 && dxx > 0 && dyy > 0,
            num.cast("double") /
              sqrt(dxx.cast("double") * dyy.cast("double"))).as("roll_corr"),
          when(cnt >= 2,
            num.cast("double") / (cnt * (cnt - 1)).cast("double") / lit(100.0))
            .as("roll_cov"),
          cnt.as("roll_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling exact median (pandas rolling(5).median()): interpolated
    // percentile over the row frame
    // ROUND-over-double-window SAFETY (r10 audit, q72d class): this
    // row keeps ROUND(percentile OVER w, 6) because it is provably
    // boundary-safe — `value` is exactly 2-decimal (fixture-checked:
    // value*100 is integer for every row, max 56021 cents) and the
    // interpolated median of 2-decimal data at frac ∈ {0, 0.5} is an
    // exact multiple of 0.005, i.e. at most 3 decimals. A 6-decimal
    // ROUND flips only if the true value sits within ~1 ulp of a
    // x.xxxxxx5 boundary; the nearest such boundary is 5e-7 away from
    // any 3-decimal value — 12 orders of magnitude beyond ulp noise,
    // so no engine-side interpolation-formula difference can flip it.
    "q71e_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-4, 0)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5)").over(w), 6).as("roll_med"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling(5).quantile(q) at arbitrary q (pandas default linear
    // interpolation == Spark percentile == DuckDB QUANTILE_CONT).
    // ROUND-over-double-window SAFETY (r10 audit): boundary-safe for
    // the same reason as q71e — 2-decimal inputs, and q·(n−1) for
    // q ∈ {.25,.75,.9}, n ≤ 5 yields interpolation fractions that are
    // exact multiples of 0.05, so true quantiles are exact multiples
    // of 0.0005 (≤ 4 decimals): 3 orders of magnitude from the nearest
    // 6-decimal ROUND boundary, unreachable by last-ulp engine drift.
    "q71g_rolling_quantile" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-4, 0)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.25)").over(w), 6).as("roll_q25"),
          round(expr("percentile(value, 0.75)").over(w), 6).as("roll_q75"),
          round(expr("percentile(value, 0.9)").over(w), 6).as("roll_q90"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling(5).skew()/kurt() with pandas' bias-corrected sample
    // formulas (pandas-validated to 1e-10; Spark's skewness/kurtosis
    // builtins are population-based and would NOT match pandas). NULL
    // below the pandas min counts (skew n>=3, kurt n>=4) and on zero
    // variance. r10: moment sums migrated off ROUND(double window agg)
    // — the q72d boundary-flip class — onto EXACT integer cents moments
    // (skew/kurt are scale-invariant, so cents == dollars): s1..s3 are
    // BIGINT window sums, s4 rides DECIMAL/HUGEINT (x^4 of max-cents
    // 56021 is 9.9e18 — past int64). Every double op now happens AFTER
    // the window on identical exact integers, single-shot in both
    // engines, so the ROUND can no longer flip.
    "q71h_rolling_skew_kurt" -> ((s, d) => {
      val over = "OVER (PARTITION BY user_id ORDER BY event_id " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .selectExpr("user_id", "event_id",
          "CAST(ROUND(value * 100) AS BIGINT) AS x")
        .selectExpr("user_id", "event_id",
          s"CAST(COUNT(*) $over AS DOUBLE) AS n",
          s"SUM(x) $over AS s1",
          s"SUM(x*x) $over AS s2",
          s"SUM(x*x*x) $over AS s3",
          s"SUM(CAST(x AS DECIMAL(19,0))*x*x*x) $over AS s4")
        .selectExpr("user_id", "event_id", "n",
          "CAST(s1 AS DOUBLE)/n AS m", "CAST(s2 AS DOUBLE)/n AS s2n",
          "CAST(s3 AS DOUBLE)/n AS s3n", "CAST(s4 AS DOUBLE)/n AS s4n")
        .selectExpr("user_id", "event_id", "n", "m",
          "s2n - m*m AS m2",
          "s3n - 3.0*m*s2n + 2.0*m*m*m AS m3",
          "s4n - 4.0*m*s3n + 6.0*m*m*s2n - 3.0*m*m*m*m AS m4")
        .selectExpr("user_id", "event_id", "CAST(n AS INT) AS roll_n",
          "ROUND(CASE WHEN n >= 3.0 AND m2 > 0.0 THEN " +
            "sqrt(n*(n-1.0))/(n-2.0)*(m3/(m2*sqrt(m2))) END, 6) AS roll_skew",
          "ROUND(CASE WHEN n >= 4.0 AND m2 > 0.0 THEN " +
            "((n+1.0)*(m4/(m2*m2)-3.0)+6.0)*(n-1.0)/((n-2.0)*(n-3.0)) END, 6) AS roll_kurt")
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling center=True (SURVEY §2.5 `center` param): the frame
    // straddles the current row symmetrically — rowsBetween(-2, 2) for
    // window=5 — instead of trailing it.
    // ROUND-over-double-window SAFETY (r10 audit): ≤ 5-term window sum
    // of exact 2-decimal doubles — accumulated fp error ≤ ~5e-15 while
    // the true sum is an exact multiple of 0.01 (ROUND(.,2) boundary
    // distance 5e-3) and the true avg an exact k/(100n), n ≤ 5, whose
    // distance from any 1e-4/2 ROUND boundary is ≥ 1/(2·3e6) ≈ 1.7e-7
    // (k·1e4 = 100n·m + n/2 has no integer solution for odd n·...) —
    // both margins are orders of magnitude beyond any re-association
    // drift, so the ROUND cannot flip cross-engine.
    "q71f_rolling_center" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 2)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          round(avg(col("value")).over(w), 4).as("roll_avg_c"),
          round(sum(col("value")).over(w), 2).as("roll_sum_c"),
          count(lit(1)).over(w).as("roll_n_c"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling(5, win_type='triang').mean() (NEW r8): pandas weighted
    // rolling with the triangular kernel [1,2,3,2,1]/9. Exact
    // integer-cents arithmetic (the q72b lesson): weighted sum of
    // lagged cents is a pure bigint expression, one final division by
    // 900.0 on exact operands — bit-identical cross-engine. Emitted
    // only where the full window exists (pandas min_periods=window).
    "q71i_rolling_weighted" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cents = round(col("value") * 100, 0).cast("long")
      val weights = Seq(1L, 2L, 3L, 2L, 1L)
      val wsum = weights.zipWithIndex.map { case (wt, i) =>
        lag(cents, 4 - i).over(w) * lit(wt)
      }.reduce(_ + _)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(col("user_id"), col("event_id"),
          (wsum.cast("double") / lit(900.0)).as("tri_mean"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling OLS slope (NEW r8): pandas rolling(10).apply(linregress)
    // — the local-trend signal. Exact-integer formulation: y in cents,
    // x = row position; all five window sums (n, Σx, Σy, Σxy, Σx²)
    // are 64-bit exact over the row frame, so numerator and
    // denominator are bit-identical longs in any engine and the slope
    // is ONE double division rounded at the end (the q72b lesson
    // applied to regression). Emitted only where the window is full.
    "q71j_rolling_slope" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wr = w.rowsBetween(-9, 0)
      val x = row_number().over(w).cast("long")
      val y = round(col("value") * 100, 0).cast("long")
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(wr).as("n"),
          sum(x).over(wr).as("sx"), sum(y).over(wr).as("sy"),
          sum(x * y).over(wr).as("sxy"), sum(x * x).over(wr).as("sxx"))
        .select(col("user_id"), col("event_id"),
          when(col("n") === 10 &&
              col("n") * col("sxx") - col("sx") * col("sx") =!= 0,
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")) / 100.0, 6))
            .as("slope"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // expanding() aggs (pandas expanding(min_periods=2).sum/mean/std):
    // the unbounded-preceding frame, mean/std gated on the running count.
    // The mean is EXACT integer-cents arithmetic, not a double running
    // AVG: r7's driver run proved Spark's running accumulation and
    // DuckDB's segment-tree window re-associate the sum differently
    // (last-ulp drift → hash fail). `value` sits on a 2-decimal grid,
    // so round(value*100) recovers the exact integer cents in both
    // engines (the product is within 1e-9 of an integer — no ties),
    // the bigint window SUM is exact, and mean = cents/count/100.0 is
    // two IEEE divisions on exact operands — bit-identical everywhere.
    "q72b_expanding" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cnt = count(lit(1)).over(w)
      val x = round(col("value") * 100, 0).cast("long")
      val cents = sum(x).over(w)
      // r9: exp_std also moved onto the exact integer moments (the
      // last ROUND(double window agg) in the expanding family)
      val sxx = sum(x * x).over(w)
      val dxx = cnt * sxx - cents * cents
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          (cents.cast("double") / lit(100.0)).as("exp_sum"),
          when(cnt >= 2, cents.cast("double") / cnt / lit(100.0)).as("exp_mean_mp2"),
          when(cnt >= 2,
            sqrt(dxx.cast("double") / (cnt * (cnt - 1)).cast("double"))
              / lit(100.0)).as("exp_std_mp2"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // expanding pairwise stats (pandas expanding().corr(other)/
    // cov(other)) on the unbounded-preceding frame, min_periods=2 gate
    // like q72b. r8's ROUND(COVAR_SAMP OVER w, 6) form hash-failed:
    // Spark's running accumulation and DuckDB's segment tree
    // re-associate the double sums differently (last-ulp drift flips
    // ROUND on boundary values). This rewrite is the q72b/q206 exact
    // integer-sufficient-statistics pattern: `value` sits on a
    // 2-decimal grid so cents = round(value*100) is an exact BIGINT,
    // y = event_id % 17 is integral, and the six window moments
    // (n, Σx, Σy, Σxy, Σxx, Σyy) are exact BIGINT sums in BOTH
    // engines. cov and corr are then the SAME sequence of IEEE ops
    // on identical integers (cast→mul→sqrt→div are each correctly
    // rounded per IEEE-754) → bit-identical doubles, no ROUND needed.
    // Overflow bound: n·Σxx ≤ n²·max(cents)² — safe to ~5e4 rows per
    // user-partition under ANSI (which fail-fasts loudly beyond).
    "q72d_expanding_corr_cov" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cnt = count(lit(1)).over(w)
      val x = round(col("value") * 100, 0).cast("long")
      val y = (col("event_id") % 17).cast("long")
      val sx = sum(x).over(w)
      val sy = sum(y).over(w)
      val sxy = sum(x * y).over(w)
      val sxx = sum(x * x).over(w)
      val syy = sum(y * y).over(w)
      val num = cnt * sxy - sx * sy
      val dxx = cnt * sxx - sx * sx
      val dyy = cnt * syy - sy * sy
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          when(cnt >= 2 && dxx > 0 && dyy > 0,
            num.cast("double") /
              sqrt(dxx.cast("double") * dyy.cast("double"))).as("exp_corr"),
          when(cnt >= 2,
            num.cast("double") / (cnt * (cnt - 1)).cast("double") / lit(100.0))
            .as("exp_cov"),
          cnt.as("exp_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // cummin + cumprod (SURVEY §2.5 cumulative family; q72 covers
    // cumsum/cummax/cumcount). cumprod as exp∘sum∘ln, the same
    // prefix-scan both engines evaluate in frame order (q79's pattern);
    // 5-col ORDER key because (l_orderkey, l_linenumber) is not unique
    "q72c_cummin_cumprod" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          round(min(col("l_quantity")).over(w), 2).as("cum_min"),
          round(exp(sum(log(lit(1.0) + col("l_discount"))).over(w)), 4).as("cum_prod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))
    }),

    // rolling with min_periods (SURVEY §2.5: `min_periods` → gate the
    // agg on the window count)
    "q71b_rolling_min_periods" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          when(count(lit(1)).over(w) >= 3, round(avg(col("value")).over(w), 4)).as("roll_avg_mp3"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // cumulative scans (reference cumsum/cummax/cumcount)
    "q72_window_cumulative" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          round(sum(col("value")).over(w), 2).as("cum_sum"),
          round(max(col("value")).over(w), 2).as("cum_max"),
          count(lit(1)).over(w).as("cum_n"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // shift/diff (reference shift(n)/diff(n) with halo exchange)
    "q73_window_shift_diff" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          round(lag(col("value"), 1).over(w), 2).as("prev_val"),
          round(lead(col("value"), 1).over(w), 2).as("next_val"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("diff1"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // time-range rolling (reference rolling("10min") on a time index):
    // RANGE frame over epoch seconds
    "q74_window_range_time" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-600, 0)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_10min"),
          round(sum(col("value")).over(w), 2).as("sum_10min"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rank(method=) matrix (pandas/cudf rank methods): min=rank,
    // dense=dense_rank, first=row_number over a total order, max=rank +
    // peer count - 1. pct variants live in q70 (percent_rank) and q70c
    // (cume_dist); rank/n is deliberately not emitted — it lands on
    // round-half boundaries whenever the partition count is 2^a·5^b
    "q70d_rank_methods" -> ((s, d) => {
      val byQty = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val peers = Window.partitionBy(col("l_returnflag"), col("l_quantity"))
      val total = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          rank().over(byQty).as("rank_min"),
          (rank().over(byQty) + count(lit(1)).over(peers) - 1).as("rank_max"),
          dense_rank().over(byQty).as("rank_dense"),
          row_number().over(total).as("rank_first"))
        .orderBy(col("l_returnflag"), col("rank_first"))
    }),

    // rank(pct=True) — the surface q70d leaves unemitted as a raw
    // double (rank/n lands on round-half boundaries whenever the
    // partition count is 2^a·5^b, where Spark half-up and DuckDB
    // half-even disagree). Gated EXACTLY instead via the q140
    // basis-points trick: floor(rank·10000/n) is pure integer
    // arithmetic — identical in both engines at every count
    "q70e_rank_pct" -> ((s, d) => {
      val byQty = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val total = Window.partitionBy(col("l_returnflag"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
          rank().over(byQty).as("rank_min"),
          floor(rank().over(byQty) * lit(10000.0) / count(lit(1)).over(total))
            .cast("long").as("pct_bp"))
        .orderBy(col("l_returnflag"), col("rank_min"),
          col("l_orderkey"), col("l_linenumber"))
    }),

    // groupby.nth(n) (pandas/cudf): the n-th row of each group in frame
    // order — row_number window + filter, one keyed Exchange
    "q24c_groupby_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 3)
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id"))
    }),

    // per-group shift on a different grouping (groupby-shift, §2.5)
    "q75_window_group_shift" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") % 17 === 0)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(lag(col("l_quantity"), 1).over(w), 2).as("prev_qty"),
          round(col("l_quantity") - lag(col("l_quantity"), 1).over(w), 2).as("qty_diff"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // first/last/nth value with explicit frames
    "q76_window_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .select(
          col("user_id"), col("event_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // groupby.transform: group aggregate broadcast back to every row —
    // an unordered window (no sort), so the plan is exchange + in-place
    // aggregation, no per-group driver loop
    "q75b_group_transform" -> ((s, d) => {
      val g = Window.partitionBy(col("l_returnflag"))
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(avg(col("l_quantity")).over(g), 4).as("grp_mean"),
          round(col("l_quantity") - avg(col("l_quantity")).over(g), 4).as("demeaned"),
          count(lit(1)).over(g).as("grp_n"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("demeaned"))
    }),

    // rank(method='average') — the pandas DEFAULT rank, absent from
    // Spark's rank family: avg of the positions a tie block occupies =
    // rank + (ties-1)/2, from two windows over one partitioning
    "q70b_rank_average" -> ((s, d) => {
      graft.ops.FrameOps.rankAverage(
          Tables.lineitem(s, d).filter(col("l_orderkey") % 331 === 0),
          "l_quantity", Seq("l_returnflag"), "avg_rank")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("avg_rank"))
        .orderBy(col("l_returnflag"), col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    }),

    // ffill/bfill (reference fillna(method='ffill'/'bfill')): last/first
    // non-null over one-sided unbounded frames — one Exchange(user_id) +
    // sort, same cost profile as any keyed window at scale. Nulls are
    // synthesized deterministically so both engines see identical gaps.
    "q77_ffill_bfill" -> ((s, d) => {
      val gappy = Tables.events(s, d)
        .filter(col("user_id") % 9 === 0)
        .withColumn("gappy",
          when(col("event_id") % 7 === 0, lit(null)).otherwise(round(col("value"), 2)))
      val part = Seq("user_id"); val order = Seq("ts", "event_id")
      graft.ops.FrameOps.bfill(
          graft.ops.FrameOps.ffill(gappy, "gappy", part, order, "ffill"),
          "gappy", part, order, "bfill")
        .select(col("user_id"), col("event_id"), col("gappy"), col("ffill"), col("bfill"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // exponentially weighted mean (reference Series.ewm(alpha).mean(),
    // adjust=True): Horner recurrence per user inside one compiled UDF,
    // replayed in DuckDB as the identical list_reduce fold
    "q74b_ewm_mean" -> ((s, d) => {
      graft.ops.FrameOps.ewmMean(
          Tables.events(s, d).filter(col("user_id") % 9 === 0),
          Seq("user_id"), "event_id", "value", alpha = 0.2, as = "ewm")
        .select(col("user_id"), col("event_id"),
          round(col("ewm"), 6).as("ewm"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ewm variance + std (pandas adjust=True, bias=False): four Horner
    // folds in one pass, debias correction, first-row null — replayed
    // fold-for-fold in DuckDB list_reduce
    "q74c_ewm_var_std" -> ((s, d) => {
      graft.ops.FrameOps.ewmVar(
          Tables.events(s, d).filter(col("user_id") % 9 === 0),
          Seq("user_id"), "event_id", "value", alpha = 0.2,
          varAs = "ewm_var", stdAs = "ewm_std")
        .select(col("user_id"), col("event_id"),
          round(col("ewm_var"), 6).as("ewm_var"),
          round(col("ewm_std"), 6).as("ewm_std"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // the segmented/scan ewm (unbounded-key formulation): O(segLen +
    // nSegments) per-task state, carry-composed across segments —
    // gated against the SAME full-fold oracle as q74b (deterministic
    // fixture, so the ~1e-12 re-association drift never moves a
    // 6-decimal rounding here)
    "q74f_ewm_segmented" -> ((s, d) => {
      graft.ops.FrameOps.ewmMeanSegmented(
          Tables.events(s, d).filter(col("user_id") % 9 === 0),
          Seq("user_id"), "event_id", "value", alpha = 0.2, as = "ewm",
          segLen = 16)
        .select(col("user_id"), col("event_id"),
          round(col("ewm"), 6).as("ewm"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ewm over a gappy series with pandas-default ignore_na=False: a
    // null observation still consumes a decay step (absolute-position
    // weights) and the held mean is emitted at null rows
    "q74e_ewm_ignore_na" -> ((s, d) => {
      val gappy = Tables.events(s, d).filter(col("user_id") % 9 === 0)
        .withColumn("v", when(col("event_id") % 7 === 0, lit(null))
          .otherwise(col("value")))
      graft.ops.FrameOps.ewmMean(gappy, Seq("user_id"), "event_id", "v",
          alpha = 0.2, as = "ewm", ignoreNa = false)
        .select(col("user_id"), col("event_id"),
          round(col("ewm"), 6).as("ewm"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ewm mean with halflife + times (pandas ewm(halflife=, times=)):
    // decay follows actual elapsed days between a customer's orders —
    // irregular gaps, not row counts; integral day gaps make the decay
    // exact powers of two, so the DuckDB fold replay is bit-identical
    "q74d_ewm_halflife" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_custkey") % 10 === 0)
        .withColumn("t", datediff(col("o_orderdate"), lit("1970-01-01")))
      graft.ops.FrameOps.ewmMeanHalflife(o, Seq("o_custkey"), "t",
          "o_orderkey", "o_totalprice", halflife = 1.0, as = "ewm_hl")
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("ewm_hl"), 6).as("ewm_hl"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ewm covariance + correlation between two per-user series (pandas
    // ewm(alpha).cov/corr, adjust=True, bias=False): six Horner folds in
    // one pass, debias on cov, debias-cancelling ratio on corr — each
    // moment's fold replayed in DuckDB list_reduce over per-row
    // materialized xy/x²/y² lists, so results are bit-identical
    "q74g_ewm_cov_corr" -> ((s, d) => {
      val e = Tables.events(s, d).filter(col("user_id") % 9 === 0)
        .withColumn("y", col("value") * 0.3 +
          pmod(col("event_id"), lit(7)).cast("double"))
      graft.ops.FrameOps.ewmCov(e, Seq("user_id"), "event_id",
          "value", "y", alpha = 0.2, covAs = "ewm_cov", corrAs = "ewm_corr")
        .select(col("user_id"), col("event_id"),
          round(col("ewm_cov"), 6).as("ewm_cov"),
          round(col("ewm_corr"), 6).as("ewm_corr"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // interpolate parity options (pandas method='values', limit=2,
    // limit_direction='both'): anchors are the order column's VALUES
    // (event_id gaps weigh the fill), nulls filled only within 2 rows
    // of a real anchor from either side
    "q77c_interpolate_opts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("v", when(pmod(col("event_id"), lit(5)).isin(1, 2),
          lit(null)).otherwise(col("value")))
      graft.ops.FrameOps.interpolate(ev, Seq("user_id"), Seq("event_id"),
          "v", "v_interp", method = "values", limit = 2,
          limitDirection = "both")
        .select(col("event_id"), col("user_id"), col("v"),
          round(col("v_interp"), 6).as("v_interp"))
        .orderBy(col("event_id"))
    }),

    // pandas interpolate(limit_area=): 'inside' fills only strictly
    // interior nulls (no edge extension), 'outside' only the
    // leading/trailing runs — both variants in one result
    "q77d_interpolate_area" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("v", when(pmod(col("event_id"), lit(5)).isin(1, 2),
          lit(null)).otherwise(col("value")))
      val ins = graft.ops.FrameOps.interpolate(ev, Seq("user_id"),
        Seq("event_id"), "v", "v_inside",
        limitDirection = "both", limitArea = "inside")
      graft.ops.FrameOps.interpolate(ins, Seq("user_id"),
          Seq("event_id"), "v", "v_outside",
          limitDirection = "both", limitArea = "outside")
        .select(col("event_id"), col("user_id"), col("v"),
          round(col("v_inside"), 6).as("v_inside"),
          round(col("v_outside"), 6).as("v_outside"))
        .orderBy(col("event_id"))
    }),

    // linear interpolation of null runs (reference
    // DataFrame.interpolate): position-based linear fill between known
    // points, leading nulls stay null, trailing nulls ffill (pandas
    // limit_direction='forward' default)
    "q77b_interpolate" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("v", when(pmod(col("event_id"), lit(5)).isin(1, 2),
          lit(null)).otherwise(col("value")))
      graft.ops.FrameOps.interpolate(ev, Seq("user_id"), Seq("event_id"),
          "v", "v_interp")
        .select(col("event_id"), col("user_id"), col("v"),
          round(col("v_interp"), 6).as("v_interp"))
        .orderBy(col("event_id"))
    }),

    // pct_change (reference Series.pct_change): lag-based, zero-base
    // guarded by NULLIF on both engines
    "q78_pct_change" -> ((s, d) => {
      graft.ops.FrameOps.pctChange(
          Tables.events(s, d).filter(col("user_id") % 9 === 0),
          "value", Seq("user_id"), Seq("ts", "event_id"), "pct_chg")
        .select(col("user_id"), col("event_id"), round(col("pct_chg"), 6).as("pct_chg"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // rolling product (reference rolling.prod / cumprod): Spark has no
    // product aggregate, so exp∘sum∘ln over the frame (values are
    // 1+discount ≥ 1 > 0); the DuckDB oracle uses its native product()
    // window, so the identity is cross-checked, not assumed
    "q79_rolling_product" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the fixture — add
      // l_extendedprice to make the frame order total in both engines
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .rowsBetween(-2, 0)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 331 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(exp(sum(log(lit(1.0) + col("l_discount"))).over(w)), 6).as("roll_prod"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // per-group outlier screening (z-score + Tukey IQR fences in one
    // stats pass) — emits only the flagged rows; z and the fences are
    // rounded before any comparison so the flags are pure functions of
    // rounded values in both engines
    // robust outlier screening (NEW r11): median/MAD robust-z — the
    // 50%-breakdown tier; flags only, rounded-before-compare
    "q235_outlier_mad" -> ((s, d) => {
      graft.ops.FrameOps.outlierFlagsMad(
          Tables.events(s, d).select(col("event_id"), col("event_type"),
            col("value")),
          Seq("event_type"), "value")
        .filter(col("is_mad_outlier"))
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"), col("med"), col("mad"),
          col("robust_z"))
        .orderBy(col("event_id"))
    }),

    // trimmed mean per group (NEW r12): the drift-resistant KPI —
    // exact p05/p95 bounds, mean of the inside, trim counts as their
    // own alert signal
    "q259_trimmed_mean" -> ((s, d) => {
      graft.ops.FrameOps.trimmedMeanBy(
          Tables.events(s, d).select(col("event_type"), col("value")),
          Seq("event_type"), "value", 0.05, 0.95)
        .orderBy(col("event_type"))
    }),

    // seasonal-profile MAD outliers (NEW r12): the q235 robust screen
    // conditioned on (event_type, hour-of-day) — a value normal at
    // peak hour is an anomaly at 3am; same 50%-breakdown estimator,
    // seasonality enters as a group key, not a model
    "q252_seasonal_outlier_mad" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        col("event_type"), hour(col("ts")).as("hod"), col("value"))
      graft.ops.FrameOps.outlierFlagsMad(ev, Seq("event_type", "hod"),
          "value", kMad = 3.0)
        .filter(col("is_mad_outlier"))
        .select(col("event_id"), col("event_type"), col("hod"),
          round(col("value"), 6).as("value"), col("med"), col("mad"),
          col("robust_z"))
        .orderBy(col("event_id"))
    }),

    "q177_outlier_flags" -> ((s, d) => {
      graft.ops.FrameOps.outlierFlags(
          Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
          Seq("event_type"), "value")
        .filter(col("is_z_outlier") || col("is_iqr_outlier"))
        .select(col("event_id"), col("event_type"),
          round(col("value"), 6).as("value"), col("z"),
          col("iqr_lo"), col("iqr_hi"),
          col("is_z_outlier"), col("is_iqr_outlier"))
        .orderBy(col("event_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q71d_rolling_corr_cov" ->
      """WITH m AS (
        |  SELECT user_id, event_id,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |    SUM(x * y) OVER w AS sxy,
        |    SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
        |  FROM (SELECT user_id, event_id,
        |          CAST(ROUND(value * 100) AS BIGINT) AS x,
        |          CAST(event_id % 17 AS BIGINT) AS y
        |        FROM events WHERE user_id % 9 = 0)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) /
        |      SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
        |  END AS roll_corr,
        |  CASE WHEN n >= 2 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 100.0
        |  END AS roll_cov,
        |  n AS roll_n
        |FROM m ORDER BY user_id, event_id""".stripMargin,

    "q71e_rolling_median" ->
      """SELECT user_id, event_id,
        |  ROUND(QUANTILE_CONT(value, 0.5) OVER w, 6) AS roll_med
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q70e_rank_pct" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  RANK() OVER wq AS rank_min,
        |  CAST(FLOOR(RANK() OVER wq * 10000.0
        |    / COUNT(*) OVER (PARTITION BY l_returnflag)) AS BIGINT) AS pct_bp
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |WINDOW wq AS (PARTITION BY l_returnflag ORDER BY l_quantity)
        |ORDER BY l_returnflag, rank_min, l_orderkey, l_linenumber""".stripMargin,

    "q70d_rank_methods" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  RANK() OVER wq AS rank_min,
        |  RANK() OVER wq + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rank_max,
        |  DENSE_RANK() OVER wq AS rank_dense,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity, l_orderkey, l_linenumber) AS rank_first
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |WINDOW wq AS (PARTITION BY l_returnflag ORDER BY l_quantity)
        |ORDER BY l_returnflag, rank_first""".stripMargin,

    "q24c_groupby_nth" ->
      """SELECT user_id, event_id, value FROM events
        |WHERE user_id % 9 = 0
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 3
        |ORDER BY user_id""".stripMargin,

    "q71h_rolling_skew_kurt" ->
      // r10: exact integer cents moments through the window (s4 via
      // HUGEINT — x^4 of max-cents overflows int64); doubles only
      // AFTER, on identical integers in both engines
      """WITH src AS (SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS x
        |  FROM events WHERE user_id % 9 = 0),
        |a AS (SELECT user_id, event_id,
        |    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        |    SUM(x) OVER w AS s1,
        |    SUM(x*x) OVER w AS s2,
        |    SUM(x*x*x) OVER w AS s3,
        |    SUM(CAST(x AS HUGEINT)*x*x*x) OVER w AS s4
        |  FROM src
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |b AS (SELECT user_id, event_id, n,
        |    CAST(s1 AS DOUBLE)/n AS m, CAST(s2 AS DOUBLE)/n AS s2n,
        |    CAST(s3 AS DOUBLE)/n AS s3n, CAST(s4 AS DOUBLE)/n AS s4n FROM a),
        |c AS (SELECT user_id, event_id, n, m,
        |    s2n - m*m AS m2,
        |    s3n - 3.0*m*s2n + 2.0*m*m*m AS m3,
        |    s4n - 4.0*m*s3n + 6.0*m*m*s2n - 3.0*m*m*m*m AS m4 FROM b)
        |SELECT user_id, event_id, CAST(n AS INT) AS roll_n,
        |  ROUND(CASE WHEN n >= 3.0 AND m2 > 0.0 THEN
        |    sqrt(n*(n-1.0))/(n-2.0)*(m3/(m2*sqrt(m2))) END, 6) AS roll_skew,
        |  ROUND(CASE WHEN n >= 4.0 AND m2 > 0.0 THEN
        |    ((n+1.0)*(m4/(m2*m2)-3.0)+6.0)*(n-1.0)/((n-2.0)*(n-3.0)) END, 6) AS roll_kurt
        |FROM c ORDER BY user_id, event_id""".stripMargin,

    "q71g_rolling_quantile" ->
      """SELECT user_id, event_id,
        |  ROUND(QUANTILE_CONT(value, 0.25) OVER w, 6) AS roll_q25,
        |  ROUND(QUANTILE_CONT(value, 0.75) OVER w, 6) AS roll_q75,
        |  ROUND(QUANTILE_CONT(value, 0.9) OVER w, 6) AS roll_q90
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q71f_rolling_center" ->
      """SELECT user_id, event_id,
        |  ROUND(AVG(value) OVER w, 4) AS roll_avg_c,
        |  ROUND(SUM(value) OVER w, 2) AS roll_sum_c,
        |  COUNT(*) OVER w AS roll_n_c
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q71i_rolling_weighted" ->
      """SELECT user_id, event_id,
        |  CAST(LAG(c, 4) OVER w * 1 + LAG(c, 3) OVER w * 2
        |    + LAG(c, 2) OVER w * 3 + LAG(c, 1) OVER w * 2
        |    + LAG(c, 0) OVER w * 1 AS DOUBLE) / 900.0 AS tri_mean
        |FROM (SELECT user_id, event_id, ts,
        |    CAST(ROUND(value * 100) AS BIGINT) AS c
        |  FROM events WHERE user_id % 9 = 0)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q71j_rolling_slope" ->
      """WITH base AS (SELECT user_id, event_id, ts,
        |    CAST(ROUND(value * 100) AS BIGINT) AS y,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS x
        |  FROM events WHERE user_id % 9 = 0),
        |s AS (SELECT user_id, event_id,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |    SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY x
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CASE WHEN n = 10 AND n * sxx - sx * sx != 0
        |    THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (n * sxx - sx * sx) / 100.0, 6) END AS slope
        |FROM s ORDER BY user_id, event_id""".stripMargin,

    "q72b_expanding" ->
      """WITH m AS (
        |  SELECT user_id, event_id,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(x * x) OVER w AS sxx
        |  FROM (SELECT user_id, event_id, ts,
        |          CAST(ROUND(value * 100) AS BIGINT) AS x
        |        FROM events WHERE user_id % 9 = 0)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CAST(sx AS DOUBLE) / 100.0 AS exp_sum,
        |  CASE WHEN n >= 2
        |    THEN CAST(sx AS DOUBLE) / n / 100.0 END AS exp_mean_mp2,
        |  CASE WHEN n >= 2
        |    THEN SQRT(CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE))
        |         / 100.0 END AS exp_std_mp2
        |FROM m ORDER BY user_id, event_id""".stripMargin,

    "q72d_expanding_corr_cov" ->
      """WITH m AS (
        |  SELECT user_id, event_id,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |    SUM(x * y) OVER w AS sxy,
        |    SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
        |  FROM (SELECT user_id, event_id, ts,
        |          CAST(ROUND(value * 100) AS BIGINT) AS x,
        |          CAST(event_id % 17 AS BIGINT) AS y
        |        FROM events WHERE user_id % 9 = 0)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) /
        |      SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
        |  END AS exp_corr,
        |  CASE WHEN n >= 2 THEN
        |    CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 100.0
        |  END AS exp_cov,
        |  n AS exp_n
        |FROM m ORDER BY user_id, event_id""".stripMargin,

    "q72c_cummin_cumprod" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |  ROUND(MIN(l_quantity) OVER w, 2) AS cum_min,
        |  ROUND(EXP(SUM(LN(1.0 + l_discount)) OVER w), 4) AS cum_prod
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_suppkey""".stripMargin,

    "q71c_rolling_std" ->
      """WITH m AS (
        |  SELECT user_id, event_id,
        |    COUNT(*) OVER w AS n,
        |    SUM(x) OVER w AS sx, SUM(x * x) OVER w AS sxx
        |  FROM (SELECT user_id, event_id,
        |          CAST(ROUND(value * 100) AS BIGINT) AS x
        |        FROM events WHERE user_id % 9 = 0)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  CASE WHEN n >= 2
        |    THEN SQRT(CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE))
        |         / 100.0 END AS roll_std,
        |  CASE WHEN n >= 2
        |    THEN CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)
        |         / 10000.0 END AS roll_var,
        |  n AS roll_n
        |FROM m ORDER BY user_id, event_id""".stripMargin,

    "q74b_ewm_mean" ->
      """WITH pre AS (SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl
        |  FROM events WHERE user_id % 9 = 0)
        |SELECT user_id, event_id,
        |  ROUND(list_reduce(pl, (a, b) -> a * 0.8 + b)
        |    / list_reduce(list_transform(pl, x -> CAST(1 AS DOUBLE)),
        |        (a, b) -> a * 0.8 + b), 6) AS ewm
        |FROM pre ORDER BY user_id, event_id""".stripMargin,

    "q74f_ewm_segmented" ->
      """WITH pre AS (SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl
        |  FROM events WHERE user_id % 9 = 0)
        |SELECT user_id, event_id,
        |  ROUND(list_reduce(pl, (a, b) -> a * 0.8 + b)
        |    / list_reduce(list_transform(pl, x -> CAST(1 AS DOUBLE)),
        |        (a, b) -> a * 0.8 + b), 6) AS ewm
        |FROM pre ORDER BY user_id, event_id""".stripMargin,

    "q74e_ewm_ignore_na" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id % 9 = 0),
        |pre AS (SELECT user_id, event_id,
        |    list(v) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl
        |  FROM e),
        |f AS (SELECT user_id, event_id,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), pl),
        |      (a, b) -> a * 0.8 + coalesce(b, CAST(0 AS DOUBLE))) AS num,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |        list_transform(pl, x -> CASE WHEN x IS NULL
        |          THEN CAST(0 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)),
        |      (a, b) -> a * 0.8 + b) AS den
        |  FROM pre)
        |SELECT user_id, event_id,
        |  ROUND(CASE WHEN den = 0 THEN NULL ELSE num / den END, 6) AS ewm
        |FROM f ORDER BY user_id, event_id""".stripMargin,

    "q74c_ewm_var_std" ->
      """WITH pre AS (SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl
        |  FROM events WHERE user_id % 9 = 0),
        |f AS (SELECT user_id, event_id,
        |    list_reduce(pl, (a, b) -> a * 0.8 + b) AS num,
        |    list_reduce(list_transform(pl, x -> CAST(1 AS DOUBLE)),
        |      (a, b) -> a * 0.8 + b) AS den,
        |    list_reduce(list_transform(pl, x -> x * x),
        |      (a, b) -> a * 0.8 + b) AS sq,
        |    list_reduce(list_transform(pl, x -> CAST(1 AS DOUBLE)),
        |      (a, b) -> a * (0.8 * 0.8) + b) AS den2
        |  FROM pre),
        |v AS (SELECT user_id, event_id,
        |    CASE WHEN den * den - den2 = 0 THEN NULL
        |      ELSE ((sq / den - (num / den) * (num / den)) * (den * den))
        |        / (den * den - den2) END AS ev
        |  FROM f)
        |SELECT user_id, event_id, ROUND(ev, 6) AS ewm_var,
        |  ROUND(CASE WHEN ev IS NULL OR ev < 0 THEN NULL ELSE sqrt(ev) END, 6) AS ewm_std
        |FROM v ORDER BY user_id, event_id""".stripMargin,

    "q74d_ewm_halflife" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE) AS t
        |  FROM orders WHERE o_custkey % 10 = 0),
        |pre AS (SELECT o_custkey, o_orderkey,
        |    list(t) OVER w AS tl, list(o_totalprice) OVER w AS xl
        |  FROM o
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY t, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT o_custkey, o_orderkey,
        |    [CAST(i AS DOUBLE) for i in range(1, len(tl) + 1)] AS idx
        |  , tl, xl FROM pre)
        |SELECT o_custkey, o_orderkey,
        |  ROUND(
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), idx), (a, i) ->
        |      a * pow(0.5, tl[CAST(i AS BIGINT)] - tl[CAST(CASE WHEN i > 1 THEN i - 1 ELSE i END AS BIGINT)])
        |        + xl[CAST(i AS BIGINT)])
        |    / list_reduce(list_prepend(CAST(0 AS DOUBLE), idx), (a, i) ->
        |      a * pow(0.5, tl[CAST(i AS BIGINT)] - tl[CAST(CASE WHEN i > 1 THEN i - 1 ELSE i END AS BIGINT)])
        |        + CAST(1 AS DOUBLE)), 6) AS ewm_hl
        |FROM f ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q74g_ewm_cov_corr" ->
      """WITH e AS (SELECT user_id, event_id, value AS x,
        |    value * 0.3 + CAST(event_id % 7 AS DOUBLE) AS y
        |  FROM events WHERE user_id % 9 = 0),
        |pre AS (SELECT user_id, event_id,
        |    list(x) OVER w AS xl, list(y) OVER w AS yl,
        |    list(x * y) OVER w AS xyl,
        |    list(x * x) OVER w AS x2l, list(y * y) OVER w AS y2l
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT user_id, event_id,
        |    list_reduce(xl, (a, b) -> a * 0.8 + b) AS numx,
        |    list_reduce(yl, (a, b) -> a * 0.8 + b) AS numy,
        |    list_reduce(xyl, (a, b) -> a * 0.8 + b) AS numxy,
        |    list_reduce(x2l, (a, b) -> a * 0.8 + b) AS sqx,
        |    list_reduce(y2l, (a, b) -> a * 0.8 + b) AS sqy,
        |    list_reduce(list_transform(xl, v -> CAST(1 AS DOUBLE)),
        |      (a, b) -> a * 0.8 + b) AS den,
        |    list_reduce(list_transform(xl, v -> CAST(1 AS DOUBLE)),
        |      (a, b) -> a * (0.8 * 0.8) + b) AS den2
        |  FROM pre),
        |v AS (SELECT user_id, event_id, den,
        |    numxy / den - (numx / den) * (numy / den) AS bcov,
        |    sqx / den - (numx / den) * (numx / den) AS bvx,
        |    sqy / den - (numy / den) * (numy / den) AS bvy,
        |    den * den - den2 AS corrden
        |  FROM f)
        |SELECT user_id, event_id,
        |  ROUND(CASE WHEN corrden = 0 THEN NULL
        |    ELSE (bcov * (den * den)) / corrden END, 6) AS ewm_cov,
        |  ROUND(CASE WHEN bvx <= 0 OR bvy <= 0 THEN NULL
        |    ELSE bcov / sqrt(bvx * bvy) END, 6) AS ewm_corr
        |FROM v ORDER BY user_id, event_id""".stripMargin,

    "q77d_interpolate_area" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CASE WHEN event_id % 5 IN (1, 2) THEN NULL ELSE value END AS v
        |  FROM events),
        |w1 AS (SELECT event_id, user_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS p
        |  FROM e),
        |w2 AS (SELECT event_id, user_id, v, p,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    last_value(CASE WHEN v IS NOT NULL THEN CAST(p AS DOUBLE) END IGNORE NULLS) OVER wb AS pp,
        |    first_value(CASE WHEN v IS NOT NULL THEN CAST(p AS DOUBLE) END IGNORE NULLS) OVER wf AS np
        |  FROM w1
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, v,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |      pv + (nv - pv) * ((CAST(p AS DOUBLE) - pp) / (np - pp))
        |    END, 6) AS v_inside,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    END, 6) AS v_outside
        |FROM w2 ORDER BY event_id""".stripMargin,

    "q77c_interpolate_opts" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CASE WHEN event_id % 5 IN (1, 2) THEN NULL ELSE value END AS v
        |  FROM events),
        |w1 AS (SELECT event_id, user_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS p,
        |    CAST(event_id AS DOUBLE) AS pa
        |  FROM e),
        |w2 AS (SELECT event_id, user_id, v, p, pa,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    last_value(CASE WHEN v IS NOT NULL THEN pa END IGNORE NULLS) OVER wb AS pp,
        |    first_value(CASE WHEN v IS NOT NULL THEN pa END IGNORE NULLS) OVER wf AS np,
        |    last_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER wb AS ppr,
        |    first_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER wf AS npr
        |  FROM w1
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, v,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |    WHEN (pv IS NOT NULL AND p - ppr <= 2)
        |      OR (nv IS NOT NULL AND npr - p <= 2) THEN
        |      CASE WHEN pv IS NULL THEN nv
        |           WHEN nv IS NULL THEN pv
        |           ELSE pv + (nv - pv) * ((pa - pp) / (np - pp)) END
        |    ELSE NULL END, 6) AS v_interp
        |FROM w2 ORDER BY event_id""".stripMargin,

    "q77b_interpolate" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CASE WHEN event_id % 5 IN (1, 2) THEN NULL ELSE value END AS v
        |  FROM events),
        |w1 AS (SELECT event_id, user_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS p
        |  FROM e),
        |w2 AS (SELECT event_id, user_id, v, p,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    last_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER wb AS pp,
        |    first_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER wf AS np
        |  FROM w1
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY user_id ORDER BY p
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, v,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN NULL
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * ((p - pp) / (np - pp)) END, 6) AS v_interp
        |FROM w2 ORDER BY event_id""".stripMargin,

    "q70_window_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  CAST(RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS INTEGER) AS rnk,
        |  CAST(DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS INTEGER) AS drnk,
        |  ROUND(PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS prnk,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS INTEGER) AS rn,
        |  CAST(NTILE(4) OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS INTEGER) AS quartile
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |ORDER BY l_returnflag, rn""".stripMargin,

    "q71_window_rolling" ->
      """SELECT user_id, event_id,
        |  ROUND(AVG(value) OVER w, 4) AS roll_avg,
        |  ROUND(SUM(value) OVER w, 2) AS roll_sum,
        |  ROUND(MIN(value) OVER w, 2) AS roll_min,
        |  ROUND(MAX(value) OVER w, 2) AS roll_max,
        |  COUNT(*) OVER w AS roll_n
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q71b_rolling_min_periods" ->
      """SELECT user_id, event_id,
        |  CASE WHEN COUNT(*) OVER w >= 3 THEN ROUND(AVG(value) OVER w, 4) END AS roll_avg_mp3
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q72_window_cumulative" ->
      """SELECT user_id, event_id,
        |  ROUND(SUM(value) OVER w, 2) AS cum_sum,
        |  ROUND(MAX(value) OVER w, 2) AS cum_max,
        |  COUNT(*) OVER w AS cum_n
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q73_window_shift_diff" ->
      """SELECT user_id, event_id,
        |  ROUND(LAG(value, 1) OVER w, 2) AS prev_val,
        |  ROUND(LEAD(value, 1) OVER w, 2) AS next_val,
        |  ROUND(value - LAG(value, 1) OVER w, 2) AS diff1
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q74_window_range_time" ->
      """SELECT user_id, event_id,
        |  COUNT(*) OVER w AS n_10min,
        |  ROUND(SUM(value) OVER w, 2) AS sum_10min
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(CAST(ts AS TIMESTAMP)) // 1000000
        |  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q75_window_group_shift" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  ROUND(LAG(l_quantity, 1) OVER w, 2) AS prev_qty,
        |  ROUND(l_quantity - LAG(l_quantity, 1) OVER w, 2) AS qty_diff
        |FROM lineitem WHERE l_suppkey % 17 = 0
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q76_window_first_last" ->
      """SELECT user_id, event_id,
        |  FIRST_VALUE(event_type) OVER w AS first_type,
        |  LAST_VALUE(event_type) OVER w AS last_type,
        |  NTH_VALUE(event_type, 2) OVER w AS second_type
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q75b_group_transform" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  ROUND(AVG(l_quantity) OVER g, 4) AS grp_mean,
        |  ROUND(l_quantity - AVG(l_quantity) OVER g, 4) AS demeaned,
        |  COUNT(*) OVER g AS grp_n
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |WINDOW g AS (PARTITION BY l_returnflag)
        |ORDER BY l_orderkey, l_linenumber, demeaned""".stripMargin,

    "q70c_cume_dist" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  ROUND(CUME_DIST() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity), 6) AS cd
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin,

    "q70b_rank_average" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |    + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS avg_rank
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber""".stripMargin,

    "q77_ffill_bfill" ->
      """SELECT user_id, event_id, gappy,
        |  LAST_VALUE(gappy IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
        |  FIRST_VALUE(gappy IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE ROUND(value, 2) END AS gappy
        |  FROM events WHERE user_id % 9 = 0
        |) ORDER BY user_id, event_id""".stripMargin,

    "q78_pct_change" ->
      """SELECT user_id, event_id,
        |  ROUND((value - LAG(value, 1) OVER w) / NULLIF(LAG(value, 1) OVER w, 0.0), 6) AS pct_chg
        |FROM events WHERE user_id % 9 = 0
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q79_rolling_product" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(PRODUCT(1.0 + l_discount) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_orderkey, l_linenumber, l_extendedprice
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS roll_prod
        |FROM lineitem WHERE l_orderkey % 331 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // the same two QUANTILE_CONT stat passes and rounded-before-
    // compare robust_z as the Spark op
    "q235_outlier_mad" ->
      """WITH md AS (SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dv AS (SELECT e.event_id, e.event_type, e.value,
        |    md.med, ABS(e.value - md.med) AS ad
        |  FROM events e JOIN md USING (event_type)),
        |ma AS (SELECT event_type, QUANTILE_CONT(ad, 0.5) AS mad
        |  FROM dv GROUP BY 1),
        |r AS (SELECT dv.event_id, dv.event_type, dv.value,
        |    ROUND(dv.med, 6) AS med, ROUND(ma.mad, 6) AS mad,
        |    CASE WHEN ma.mad > 0
        |      THEN ROUND(dv.ad / (1.4826 * ma.mad), 6) END AS robust_z
        |  FROM dv JOIN ma USING (event_type))
        |SELECT event_id, event_type, ROUND(value, 6) AS value, med, mad,
        |  robust_z
        |FROM r WHERE COALESCE(robust_z > 3.5, FALSE)
        |ORDER BY event_id""".stripMargin,

    "q259_trimmed_mean" ->
      """WITH b AS (SELECT event_type,
        |    QUANTILE_CONT(value, CAST(0.05 AS DOUBLE)) AS qlo,
        |    QUANTILE_CONT(value, CAST(0.95 AS DOUBLE)) AS qhi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) FILTER (WHERE e.value < b.qlo) AS BIGINT)
        |    AS n_trimmed_lo,
        |  CAST(COUNT(*) FILTER (WHERE e.value > b.qhi) AS BIGINT)
        |    AS n_trimmed_hi,
        |  ROUND(b.qlo, 6) AS lo, ROUND(b.qhi, 6) AS hi,
        |  ROUND(AVG(e.value) FILTER (
        |    WHERE e.value >= b.qlo AND e.value <= b.qhi), 6)
        |    AS trimmed_mean
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type, b.qlo, b.qhi
        |ORDER BY e.event_type""".stripMargin,

    "q252_seasonal_outlier_mad" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS INTEGER)
        |      AS hod, value FROM events),
        |md AS (SELECT event_type, hod, QUANTILE_CONT(value, 0.5) AS med
        |  FROM ev GROUP BY 1, 2),
        |dv AS (SELECT e.event_id, e.event_type, e.hod, e.value,
        |    md.med, ABS(e.value - md.med) AS ad
        |  FROM ev e JOIN md USING (event_type, hod)),
        |ma AS (SELECT event_type, hod, QUANTILE_CONT(ad, 0.5) AS mad
        |  FROM dv GROUP BY 1, 2),
        |r AS (SELECT dv.event_id, dv.event_type, dv.hod, dv.value,
        |    ROUND(dv.med, 6) AS med, ROUND(ma.mad, 6) AS mad,
        |    CASE WHEN ma.mad > 0
        |      THEN ROUND(dv.ad / (1.4826 * ma.mad), 6) END AS robust_z
        |  FROM dv JOIN ma USING (event_type, hod))
        |SELECT event_id, event_type, hod, ROUND(value, 6) AS value,
        |  med, mad, robust_z
        |FROM r WHERE COALESCE(robust_z > 3.0, FALSE)
        |ORDER BY event_id""".stripMargin,

    "q177_outlier_flags" ->
      """WITH st AS (SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd,
        |    QUANTILE_CONT(value, 0.25) AS q1, QUANTILE_CONT(value, 0.75) AS q3
        |  FROM events GROUP BY 1),
        |f AS (SELECT event_type, mu, sd,
        |    ROUND(q1 - 1.5 * (q3 - q1), 6) AS iqr_lo,
        |    ROUND(q3 + 1.5 * (q3 - q1), 6) AS iqr_hi FROM st),
        |r AS (SELECT e.event_id, e.event_type, e.value AS raw,
        |    CASE WHEN f.sd > 0 THEN ROUND((e.value - f.mu) / f.sd, 6) END AS z,
        |    f.iqr_lo, f.iqr_hi
        |  FROM events e JOIN f USING (event_type))
        |SELECT event_id, event_type, ROUND(raw, 6) AS value, z, iqr_lo, iqr_hi,
        |  COALESCE(ABS(z) > 3.0, FALSE) AS is_z_outlier,
        |  (raw < iqr_lo OR raw > iqr_hi) AS is_iqr_outlier
        |FROM r WHERE COALESCE(ABS(z) > 3.0, FALSE) OR raw < iqr_lo OR raw > iqr_hi
        |ORDER BY event_id""".stripMargin
  )
}
