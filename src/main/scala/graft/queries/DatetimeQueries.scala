package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.DatetimeOps

/** Datetime surface — SURVEY.md §2.8 (`Series.dt.*`): component extract,
  * trunc/round, strftime/to_datetime, arithmetic. Reference anchors:
  * [python/cudf/cudf/core/series.py :: class DatetimeProperties],
  * kernels [cpp/src/datetime/datetime_ops.cu].
  *
  * Dialect notes (verified vs DuckDB 1.0):
  *  - Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → +1.
  *  - Spark unix_timestamp truncates to seconds; DuckDB epoch() keeps the
  *    fraction → FLOOR + cast on the oracle side.
  *  - date_trunc returns TIMESTAMP in Spark but DATE in DuckDB for
  *    day-and-coarser → compare as formatted strings.
  *  - strftime dialect: '%Y-%m-%d %H:%M:%S' ↔ 'yyyy-MM-dd HH:mm:ss'.
  */
object DatetimeQueries extends QueryGroup {

  override def queries: Map[String, Q] = Map(
    // component extraction on a date-grained column
    "q50_dt_extract_date" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"))
        .orderBy(col("o_orderkey"))
    }),

    // component extraction on sub-second event time
    "q51_dt_extract_time" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") % 101 === 0)
        .select(
          col("event_id"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          (unix_micros(col("ts")) % 1000000).as("micros"))
        .orderBy(col("event_id"))
    }),

    // calendar predicates (is_leap_year / days_in_month /
    // is_month_start / is_quarter_end — SURVEY §2.8 "rest via expr combos")
    "q50b_dt_calendar" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .select(
          col("o_orderkey"),
          (dayofyear(make_date(year(col("o_orderdate")), lit(12), lit(31))) === 366).as("is_leap"),
          dayofmonth(last_day(col("o_orderdate").cast("date"))).as("days_in_month"),
          (dayofmonth(col("o_orderdate")) === 1).as("is_month_start"),
          (col("o_orderdate").cast("date") === last_day(col("o_orderdate").cast("date"))).as("is_month_end"),
          (quarter(col("o_orderdate")) =!= quarter(col("o_orderdate") + expr("INTERVAL 1 DAY"))).as("is_quarter_end"))
        .orderBy(col("o_orderkey"))
    }),

    // pandas dt.isocalendar(): ISO week-numbering (year, week, day).
    // The oracle uses DuckDB's NATIVE isoyear/weekofyear/isodow — an
    // independent implementation, so the Thursday-trick expressions in
    // DatetimeOps are cross-checked, not replayed
    "q50c_isocalendar" -> ((s, d) => {
      val dt = col("o_orderdate").cast("date")
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .select(
          col("o_orderkey"),
          DatetimeOps.isoYear(dt).as("iso_year"),
          DatetimeOps.isoWeek(dt).as("iso_week"),
          DatetimeOps.isoDow(dt).as("iso_day"))
        .orderBy(col("o_orderkey"))
    }),

    // numpy busday_count(start, end): weekdays in [start, end) for a
    // spread of span lengths hitting every (dow, remainder) combination
    "q53c_busday" -> ((s, d) => {
      val start = col("o_orderdate").cast("date")
      val end = expr("date_add(CAST(o_orderdate AS DATE), CAST(o_orderkey % 40 + 1 AS INT))")
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .select(
          col("o_orderkey"),
          date_format(start, "yyyy-MM-dd").as("start_d"),
          date_format(end, "yyyy-MM-dd").as("end_d"),
          DatetimeOps.busdayCount(start, end).as("busdays"))
        .orderBy(col("o_orderkey"))
    }),

    // trunc + format (strftime dialect translation)
    "q52_dt_trunc_format" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") % 101 === 0)
        .select(
          col("event_id"),
          date_format(date_trunc("month", col("ts")), "yyyy-MM-dd").as("month_start"),
          date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week_start"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day_start"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("fmt_full"))
        .orderBy(col("event_id"))
    }),

    // dt.floor/ceil to an arbitrary frequency ('15min' — finer than any
    // date_trunc unit). Epoch arithmetic on the FRACTIONAL-seconds cast
    // (ts.cast(double)), not unix_timestamp: unix_timestamp drops
    // microseconds, and a ts sitting exactly on a 15-min boundary plus
    // micros would then ceil one bucket low vs DuckDB's epoch()
    "q52b_dt_floor_ceil" -> ((s, d) => {
      val ep = col("ts").cast("double")
      Tables.events(s, d)
        .filter(col("event_id") % 101 === 0)
        .select(
          col("event_id"),
          date_format(timestamp_seconds(floor(ep / 900) * 900),
            "yyyy-MM-dd HH:mm:ss").as("floor_15m"),
          date_format(timestamp_seconds(ceil(ep / 900) * 900),
            "yyyy-MM-dd HH:mm:ss").as("ceil_15m"),
          date_format(timestamp_seconds(floor(ep / 3600) * 3600),
            "yyyy-MM-dd HH:mm:ss").as("floor_1h"))
        .orderBy(col("event_id"))
    }),

    // dt.tz_localize('UTC').tz_convert(zone) (cudf >= 23.12): naive
    // UTC instants to wall-clock time in a named IANA zone, plus the
    // inverse round-trip. from_utc_timestamp/to_utc_timestamp are the
    // session-tz-independent pair (the fixture's Jan-2024 range has no
    // US DST transition; Kolkata exercises a half-hour offset)
    "q53b_tz_convert" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") % 101 === 0)
        .select(
          col("event_id"),
          date_format(from_utc_timestamp(col("ts"), "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("ny_wall"),
          date_format(from_utc_timestamp(col("ts"), "Asia/Kolkata"),
            "yyyy-MM-dd HH:mm:ss").as("kolkata_wall"),
          date_format(from_utc_timestamp(col("ts"), "Australia/Sydney"),
            "yyyy-MM-dd HH:mm:ss").as("sydney_wall"),
          date_format(to_utc_timestamp(
              from_utc_timestamp(col("ts"), "America/New_York"),
              "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("roundtrip_utc"))
        .orderBy(col("event_id"))
    }),

    // arithmetic: datediff / interval add / add_months / last_day / epoch
    "q53_dt_arith" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .select(
          col("o_orderkey"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_98"),
          date_format(col("o_orderdate") + expr("INTERVAL 3 DAY"), "yyyy-MM-dd HH:mm:ss").as("plus3d"),
          date_format(add_months(col("o_orderdate").cast("date"), 2), "yyyy-MM-dd").as("plus2mo"),
          date_format(last_day(col("o_orderdate").cast("date")), "yyyy-MM-dd").as("eom"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_ms"))
        .orderBy(col("o_orderkey"))
    }),

    // to_datetime: parse from string and round-trip
    "q54_dt_parse" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .withColumn("date_str", date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .select(
          col("o_orderkey"),
          col("date_str"),
          date_format(to_timestamp(col("date_str"), "yyyy-MM-dd"), "yyyy-MM-dd HH:mm:ss").as("parsed"),
          year(to_date(col("date_str"), "yyyy-MM-dd")).as("parsed_year"))
        .orderBy(col("o_orderkey"))
    }),

    // pandas to_datetime(errors='coerce'): malformed inputs become
    // null instead of failing the job (try_to_timestamp vs DuckDB
    // TRY_STRPTIME — independent lenient parsers agreeing on validity)
    "q54b_dt_parse_coerce" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 149 === 0)
        .withColumn("raw", when(col("o_orderkey") % 3 === 0,
            concat(lit("xx-"), col("o_orderkey"))) // deliberately malformed
          .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        .select(
          col("o_orderkey"), col("raw"),
          date_format(expr("try_to_timestamp(raw, 'yyyy-MM-dd')"),
            "yyyy-MM-dd HH:mm:ss").as("parsed"),
          expr("try_to_timestamp(raw, 'yyyy-MM-dd')").isNull.as("coerced_null"))
        .orderBy(col("o_orderkey"))
    }),

    // epoch-aligned time bucketing (the batch analog of a tumbling
    // window — reused by the streaming surface, SURVEY §2.11)
    "q55_dt_bucket" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(expr("(unix_timestamp(ts) div 300) * 300").as("bucket_s"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .orderBy(col("bucket_s"))
    }),

    // calendar boundaries (reference dt ceil/floor to month/week,
    // cudf datetime add_calendrical_months): next weekday, month end,
    // clamped month add, ISO week start, month-boundary distance
    "q56_dt_boundaries" -> ((s, d) => {
      Tables.orders(s, d).filter(col("o_orderkey") % 149 === 0)
        .select(col("o_orderkey"),
          date_format(next_day(col("o_orderdate"), "Mon"), "yyyy-MM-dd").as("next_mon"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2m"),
          date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"),
          ((year(col("o_orderdate")) - lit(1995)) * 12 + month(col("o_orderdate")) - 1)
            .as("months_since_95"))
        .orderBy(col("o_orderkey"))
    }),

    // pandas resample('1h').agg(...) with gap surfacing: hourly buckets
    // over a sparse stream (purchase events leave ~47 of 720 hours
    // empty at sf0.01), dense calendar join, count 0 / avg null on
    // gaps, plus a forward-filled avg (resample().ffill() composition)
    "q57_dt_resample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val r = graft.ops.FrameOps.resample(
        Tables.events(s, d).filter(col("event_type") === "purchase"),
        ts = "ts", unit = "hour", step = "1 hour",
        aggs = Seq(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value")))
      // the ffill window is over the bounded calendar (range/step rows),
      // not the event stream — safe unpartitioned at any corpus size
      val wFill = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
      r.select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("h"),
          coalesce(col("n"), lit(0L)).as("n"), col("avg_value"),
          last(col("avg_value"), ignoreNulls = true).over(wFill).as("avg_filled"))
        .orderBy(col("h"))
    }),

    // resample().ohlc() (NEW r8, the pandas finance staple): open =
    // value at the earliest (ts, event_id) in the hour bucket, close =
    // latest, high/low = extremes. OHLC columns are SELECTED values
    // (no arithmetic) — bit-identical cross-engine without rounding
    "q57b_resample_ohlc" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d).filter(col("event_type") === "purchase")
        .withColumn("bucket", date_trunc("hour", col("ts")))
      val wAsc = Window.partitionBy(col("bucket")).orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("bucket")).orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn_o", row_number().over(wAsc))
        .withColumn("rn_c", row_number().over(wDesc))
        .groupBy(col("bucket"))
        .agg(
          min(when(col("rn_o") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          min(when(col("rn_c") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("open"), col("high"), col("low"), col("close"), col("n"))
        .orderBy(col("h"))
    }),

    // funnel analysis: per user, first view → first purchase strictly
    // after it (event-sequence matching, the analytics staple pandas
    // users hand-roll); one grouped aggregation via conditional mins
    "q59_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          count(lit(1)).as("n_events"))
        .join(e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("t_p")),
          Seq("user_id"), "left")
        .groupBy(col("user_id"), col("t_view"), col("n_events"))
        .agg(min(when(col("t_p") > col("t_view"), col("t_p"))).as("t_conv"))
        .agg(count(lit(1)).as("n_users"),
          count(col("t_view")).as("n_viewed"),
          count(col("t_conv")).as("n_converted"),
          round(count(col("t_conv")).cast("double") / count(col("t_view")), 4)
            .as("view_to_purchase_rate"))
    }),

    // retention cohorts: users grouped by first-seen week, counted in
    // each subsequent active week — the (cohort, weeks_since) matrix
    "q59b_retention" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), weekofyear(col("ts")).as("w"))
      // fixture spans one month of one year, so the week number alone
      // identifies the period (documented; a real pipeline keys on
      // year*53+week)
      val firstWeek = e.groupBy(col("user_id")).agg(min(col("w")).as("cohort"))
      e.select(col("user_id"), col("w")).distinct()
        .join(firstWeek, "user_id")
        .groupBy(col("cohort"), (col("w") - col("cohort")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("weeks_since"))
    }),

    // event-type transition matrix (NEW r8): per-user ordered lag pairs
    // → global (prev, next) counts + row-normalized probability floored
    // to basis points — the Markov view of the event stream (completes
    // the funnel/retention event-analytics family)
    "q59c_event_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("prev_type")).agg(sum(col("n")).as("tot"))
      counts.join(totals, "prev_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          floor(col("n") * lit(10000L) / col("tot")).cast("long").as("p_bp"))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // SCD type-2 interval construction (NEW r8): collapse the event
    // log into per-user event_type validity intervals — change rows
    // survive, valid_to = next change (null = current). Second-
    // resolution formatting for the cross-engine compare (q57b's
    // pattern); the op itself keeps full precision.
    "q183_scd2" -> ((s, d) => {
      graft.ops.FrameOps.scd2Intervals(
          Tables.events(s, d).filter(col("user_id") % 7 === 0),
          "user_id", Seq("ts", "event_id"), Seq("event_type"))
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // point-in-time enrichment join (NEW r9): the consumer side of
    // q183 — every purchase fact picks up the event_type regime whose
    // SCD2 validity interval contains the purchase timestamp; facts
    // are a slice of the same log the dimension was built from, so
    // every purchase lands in exactly one interval (often the one it
    // itself opened — the boundary contract [from, to) is part of the
    // gate). Plain key-equi-join + interval post-filter: the 100 TB
    // plan, no range-bin machinery needed when an equality key exists
    "q210_point_in_time_join" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") % 7 === 0)
      val dim = graft.ops.FrameOps.scd2Intervals(
          ev, "user_id", Seq("ts", "event_id"), Seq("event_type"))
        .withColumnRenamed("event_type", "regime")
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      graft.ops.FrameOps.pointInTimeJoin(facts, dim, "user_id", "ts")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("regime"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // time-weighted average value per user (NEW r8): TWAP over the
    // irregular event stream — each observation holds until the next
    // one, so the mean weights value by holding duration. Exact
    // integers end to end: cents × millisecond durations summed as
    // longs, ONE integer division at the end (the q72b discipline);
    // the last observation of a user has no successor and drops out,
    // matching the standard TWAP convention
    "q199_twap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("c"),
          unix_micros(col("ts")).as("t_us"))
        .withColumn("next_us", lead(col("t_us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dms", expr("(next_us - t_us) div 1000"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_holds"),
          sum(col("dms")).as("held_ms"),
          expr("sum(c * dms) div sum(dms)").as("twap_c"))
        .orderBy(col("user_id"))
    }),

    // last-touch conversion attribution (NEW r8): each purchase is
    // attributed to the latest non-purchase event of the same user in
    // the preceding 30 minutes (struct-max over a RANGE frame — a
    // total lexicographic order both engines share); purchases with no
    // touch in the window land in the 'none' bucket
    "q200_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tUs = unix_micros(col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(tUs)
        .rangeBetween(-30L * 60 * 1000000, 0)
      val touch = max(when(col("event_type") =!= "purchase",
        struct(col("ts"), col("event_id"), col("event_type")))).over(w)
      Tables.events(s, d)
        .withColumn("src", touch("event_type"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("src"), lit("none")).as("source"))
        .agg(count(lit(1)).as("n_conversions"))
        .withColumn("share_bp", expr(
          "(10000 * n_conversions) div sum(n_conversions) over ()"))
        .orderBy(col("source"))
    }),

    // ordered multi-step funnel (NEW r11): per-user greedy earliest
    // completion of view→click→purchase — depth = furthest step
    // reached in order, greedy min-timestamps so the whole per-user
    // frame hash-gates; the S-step generalization of q59's 2-step
    // aggregate (S−1 keyed joins of user-level frames, no per-user
    // event sort)
    "q227_funnel_steps" -> ((s, d) => {
      graft.ops.ScaleJoins.funnelSteps(Tables.events(s, d), "user_id",
          "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    }),

    // cohort retention matrix (NEW r12): users cohorted by first
    // activity week (epoch-day div 7 — no ISO-week dialect drift),
    // per (cohort, weeks-since) active counts + retention floor bp
    "q260_cohort_retention" -> ((s, d) => {
      graft.ops.FrameOps.cohortRetention(Tables.events(s, d),
          "user_id", "ts")
        .orderBy(col("cohort_week"), col("weeks_since"))
    }),

    // event-sequence trigram motifs (NEW r12): funnel DISCOVERY — the
    // top "a>b>c" runs of consecutive per-user events with occurrence
    // and distinct-user counts; one user-keyed window + one agg
    "q253_sequence_motifs" -> ((s, d) => {
      graft.ops.ScaleJoins.sequenceMotifs(Tables.events(s, d),
          "user_id", "ts", "event_id", "event_type", n = 3)
        .orderBy(col("n_occurrences").desc, col("motif"))
        .limit(50)
    }),

    // seasonal-naive forecast backtest (NEW r13): per event_type, the
    // daily cent totals scored against the value 7 days earlier —
    // alignment by equi-join on (key, day − 7), never a lag window
    // (gaps would silently mis-align row offsets); integer MAE/WAPE,
    // signed error sum emitted raw (signed integer division does not
    // replay across engines)
    "q269_seasonal_backtest" -> ((s, d) => {
      graft.ops.FrameOps.seasonalNaiveBacktest(
          Tables.events(s, d), "event_type", "ts", "value", season = 7)
        .orderBy(col("event_type"))
    }),

    // inter-event cadence per user (NEW r8): gap count, exact mean gap
    // (integer division of second-quantized gaps), and the coefficient
    // of variation in floor bp — the burstiness screen (bots are
    // metronomes, cv→0; bursty humans cv≫1). The only non-integer
    // steps are one IEEE-exact SQRT and one division on exact operands
    "q208_cadence" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("t_us"))
        .withColumn("next_us", lead(col("t_us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("g", expr("(next_us - t_us) div 1000000"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("g")).as("s"), sum(col("g") * col("g")).as("ssq"))
        .filter(col("s") > 0)
        .select(col("user_id"), col("n_gaps"),
          expr("s div n_gaps").as("mean_gap_s"),
          expr("CAST(FLOOR(10000.0 * SQRT(CAST(n_gaps * ssq - s * s AS DOUBLE))" +
            " / CAST(s AS DOUBLE)) AS BIGINT)").as("cv_bp"))
        .orderBy(col("user_id"))
    }),

    // trailing-7-day distinct users per day (NEW r11): the rolling
    // active-user series, computed as distinct (day, user) pairs
    // fanned out to the ≤7 window-end days each contributes to — no
    // count-distinct-over-window (undistributable), no event-table
    // self-join; the blowup factor is the window length, never data
    // volume
    "q236_trailing_distinct" -> ((s, d) => {
      graft.ops.FrameOps.trailingDistinct(Tables.events(s, d),
          "ts", "user_id", windowDays = 7, as = "u7")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("u7"))
        .orderBy(col("day"))
    }),

    // classical seasonal-trend decomposition (NEW r15): the textbook
    // decompose() over hourly slots with daily (period-24) phase —
    // floor-mean slots, centered 25-slot MA trend (NULL until FULL),
    // per-phase floor-mean seasonal, residual; the one time-series
    // kernel the TWAP/EWM/CUSUM/OLS family was missing. One shuffle to
    // the slot series; the decomposition rides the 720-slot frame
    "q298_seasonal_decompose" -> ((s, d) => {
      graft.ops.DatetimeOps.seasonalDecompose(Tables.events(s, d),
          "ts", "value")
        .select(date_format(col("slot_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("slot_ts"),
          col("n_events"), col("v_c"), col("trend_c"),
          col("seasonal_c"), col("resid_c"))
        .orderBy(col("slot_ts"))
    }),

    // per-series seasonal decomposition (NEW r15): q298 keyed by
    // event_type — every window PARTITIONS by the series, the
    // shape a million-dashboard deployment needs (no single-partition
    // stage anywhere)
    "q316_seasonal_by" -> ((s, d) => {
      graft.ops.DatetimeOps.seasonalDecomposeBy(Tables.events(s, d),
          "event_type", "ts", "value")
        .select(col("event_type"),
          date_format(col("slot_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("slot_ts"),
          col("n_events"), col("v_c"), col("trend_c"),
          col("seasonal_c"), col("resid_c"))
        .orderBy(col("event_type"), col("slot_ts"))
    }),

    // per-user OLS trend (NEW r8): slope/intercept/R² of value cents
    // against event position — exact integer sufficient statistics,
    // final ratios the only doubles (shared expression strings)
    "q206_group_ols" -> ((s, d) => {
      graft.ops.FrameOps.groupOls(
          Tables.events(s, d)
            .withColumn("cents", round(col("value") * 100, 0).cast("long")),
          Seq("user_id"), Seq("ts", "event_id"), "cents")
        .orderBy(col("user_id"))
    }),

    // time-decayed engagement score per user (NEW r8): value·2^(−age/
    // 7 days) as of the corpus max instant — the recency-weighted
    // activity feature; decay factor ROUND(EXP, 6)-pinned, per-event
    // contributions floored to integers, summed as BIGINT
    "q204_decayed_engagement" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          round(col("value") * 100, 0).cast("long").as("c"),
          unix_micros(col("ts")).as("t_us"))
      val ref = ev.agg(max(col("t_us")).as("ref_us"))
      val aged = ev.crossJoin(broadcast(ref))
        .withColumn("age_us", col("ref_us") - col("t_us"))
      graft.ops.DatetimeOps.decayedSum(aged, Seq("user_id"),
          "c", "age_us", halflifeUs = 7L * 24 * 3600 * 1000000)
        .orderBy(col("user_id"))
    }),

    // CUSUM change-point per event type (NEW r8): the day where the
    // cumulative daily-cents sum deviates most from the uniform trend
    // — cross-multiplied integer form (n·prefix − k·total), no mean,
    // no division, bit-exact in any engine
    "q202_cusum" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.ops.FrameOps.cusumChangePoint(daily, Seq("event_type"),
          "day", "cents")
        .select(col("event_type"), col("change_pos"),
          date_format(col("change_at"), "yyyy-MM-dd").as("change_day"),
          col("dev_n"), col("n_points"))
        .orderBy(col("event_type"))
    }),

    // ranking metrics (NEW r8): MRR + binary nDCG@3 of each user's
    // value-ranked event types judged against the count-ranked truth —
    // exercises Similarity.rankingMetrics on a fully SQL-replayable
    // pair of rankings (value in exact integer cents, q72b's lesson;
    // ties broken lexicographically)
    "q186_ranking_metrics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .groupBy(col("user_id").as("q_id"), col("event_type").as("n_id"))
        .agg(count(lit(1)).as("mc"),
          sum(round(col("value") * 100, 0).cast("long")).as("mv"))
      val truth = ev.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("mc").desc, col("n_id"))))
      val approx = ev.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("mv").desc, col("n_id"))))
      graft.ops.Similarity.rankingMetrics(approx, truth, k = 3)
        .orderBy(col("q_id"))
    })
  )

  /** The greedy view→click→purchase chain as three CTE hops: t0 = min
    * view, t1 = min click AFTER t0, t2 = min purchase AFTER t1 — users
    * stalled at a step never advance (each hop joins the previous
    * hop's survivors). Shared verbatim by batch q227 and streaming
    * q230 (the stream's drained state equals the batch op).
    */
  private[queries] val funnelOracleSql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |s0 AS (SELECT user_id, MIN(ts) AS t0 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s1 AS (SELECT s0.user_id, MIN(e.ts) AS t1 FROM s0 JOIN e
      |  ON e.user_id = s0.user_id AND e.event_type = 'click'
      |    AND e.ts > s0.t0 GROUP BY s0.user_id),
      |s2 AS (SELECT s1.user_id, MIN(e.ts) AS t2 FROM s1 JOIN e
      |  ON e.user_id = s1.user_id AND e.event_type = 'purchase'
      |    AND e.ts > s1.t1 GROUP BY s1.user_id),
      |f AS (SELECT s0.user_id,
      |    1 + CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END AS depth,
      |    s0.t0 AS t_first, COALESCE(s2.t2, s1.t1, s0.t0) AS t_last
      |  FROM s0 LEFT JOIN s1 USING (user_id)
      |  LEFT JOIN s2 USING (user_id))
      |SELECT user_id, CAST(depth AS INTEGER) AS depth, t_first, t_last,
      |  CAST((EPOCH_US(t_last) - EPOCH_US(t_first)) // 1000000 AS BIGINT)
      |    AS span_sec
      |FROM f ORDER BY user_id""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q227_funnel_steps" -> funnelOracleSql,

    "q260_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |    (EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000) // 7 AS w
        |  FROM events WHERE user_id IS NOT NULL),
        |cohort AS (SELECT u, MIN(w) AS cw FROM uw GROUP BY u),
        |sizes AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size
        |  FROM cohort GROUP BY cw),
        |act AS (SELECT c.cw, uw.w - c.cw AS weeks_since,
        |    CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM uw JOIN cohort c ON uw.u = c.u GROUP BY 1, 2)
        |SELECT act.cw AS cohort_week, weeks_since, n_active,
        |  cohort_size, (10000 * n_active) // cohort_size AS retention_bp
        |FROM act JOIN sizes ON act.cw = sizes.cw
        |ORDER BY cohort_week, weeks_since""".stripMargin,

    "q253_sequence_motifs" ->
      // leads over the same unique (ts, event_id) order; a null last
      // lead marks a truncated run (middle leads can't be null once
      // null-typed rows are filtered first)
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_id, event_type FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |m AS (SELECT user_id,
        |    event_type || '>' || LEAD(event_type, 1) OVER w
        |      || '>' || LEAD(event_type, 2) OVER w AS motif,
        |    LEAD(event_type, 2) OVER w AS l2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT motif, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM m WHERE l2 IS NOT NULL
        |GROUP BY motif ORDER BY n_occurrences DESC, motif
        |LIMIT 50""".stripMargin,

    "q59_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |u AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    COUNT(*) AS n_events
        |  FROM e GROUP BY user_id),
        |c AS (SELECT u.user_id, u.t_view,
        |    MIN(CASE WHEN p.ts > u.t_view THEN p.ts END) AS t_conv
        |  FROM u LEFT JOIN e p
        |    ON p.user_id = u.user_id AND p.event_type = 'purchase'
        |  GROUP BY u.user_id, u.t_view)
        |SELECT COUNT(*) AS n_users, COUNT(t_view) AS n_viewed,
        |  COUNT(t_conv) AS n_converted,
        |  ROUND(COUNT(t_conv) * 1.0 / COUNT(t_view), 4) AS view_to_purchase_rate
        |FROM c""".stripMargin,

    "q59b_retention" ->
      """WITH e AS (SELECT user_id, WEEK(CAST(ts AS TIMESTAMP)) AS w FROM events),
        |f AS (SELECT user_id, MIN(w) AS cohort FROM e GROUP BY user_id),
        |d2 AS (SELECT DISTINCT user_id, w FROM e)
        |SELECT cohort, w - cohort AS weeks_since,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM d2 JOIN f USING (user_id)
        |GROUP BY cohort, w - cohort ORDER BY cohort, weeks_since""".stripMargin,

    "q59c_event_transitions" ->
      """WITH p AS (SELECT user_id, event_type AS next_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, COUNT(*) AS n FROM p
        |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
        |  CAST(FLOOR(c.n * 10000 / t.tot) AS BIGINT) AS p_bp
        |FROM c JOIN t USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,

    "q50_dt_extract_date" ->
      """SELECT o_orderkey,
        |  YEAR(o_orderdate) AS y,
        |  MONTH(o_orderdate) AS m,
        |  DAYOFMONTH(o_orderdate) AS dom,
        |  QUARTER(o_orderdate) AS q,
        |  DAYOFWEEK(o_orderdate) + 1 AS dow,
        |  DAYOFYEAR(o_orderdate) AS doy,
        |  WEEKOFYEAR(o_orderdate) AS woy
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q51_dt_extract_time" ->
      """SELECT event_id,
        |  HOUR(ts) AS h,
        |  MINUTE(ts) AS mi,
        |  SECOND(ts) AS sec,
        |  EPOCH_US(CAST(ts AS TIMESTAMP)) % 1000000 AS micros
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    "q50b_dt_calendar" ->
      """SELECT o_orderkey,
        |  DAYOFYEAR(MAKE_DATE(YEAR(o_orderdate), 12, 31)) = 366 AS is_leap,
        |  DAYOFMONTH(LAST_DAY(CAST(o_orderdate AS DATE))) AS days_in_month,
        |  DAYOFMONTH(o_orderdate) = 1 AS is_month_start,
        |  CAST(o_orderdate AS DATE) = LAST_DAY(CAST(o_orderdate AS DATE)) AS is_month_end,
        |  QUARTER(o_orderdate) != QUARTER(o_orderdate + INTERVAL 1 DAY) AS is_quarter_end
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    // independent implementation: DuckDB natives, not a formula replay
    "q50c_isocalendar" ->
      """SELECT o_orderkey,
        |  CAST(ISOYEAR(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_year,
        |  CAST(WEEKOFYEAR(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
        |  CAST(ISODOW(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_day
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q53c_busday" ->
      """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 40 + 1 AS INTEGER) AS e
        |  FROM orders WHERE o_orderkey % 149 = 0),
        |c AS (SELECT o_orderkey, s, e, e - s AS days, ISODOW(s) AS dw,
        |    (e - s) % 7 AS rem FROM t)
        |SELECT o_orderkey, STRFTIME(s, '%Y-%m-%d') AS start_d,
        |  STRFTIME(e, '%Y-%m-%d') AS end_d,
        |  CAST((days // 7) * 5 + rem
        |    - CASE WHEN dw <= 6 AND dw + rem - 1 >= 6 THEN 1 ELSE 0 END
        |    - CASE WHEN dw + rem - 1 >= 7 THEN 1 ELSE 0 END AS INTEGER) AS busdays
        |FROM c ORDER BY o_orderkey""".stripMargin,

    "q52_dt_trunc_format" ->
      """SELECT event_id,
        |  STRFTIME(DATE_TRUNC('month', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS month_start,
        |  STRFTIME(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS week_start,
        |  STRFTIME(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day_start,
        |  STRFTIME(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS fmt_full
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    "q52b_dt_floor_ceil" ->
      """SELECT event_id,
        |  STRFTIME(TO_TIMESTAMP(FLOOR(EPOCH(CAST(ts AS TIMESTAMP)) / 900) * 900),
        |    '%Y-%m-%d %H:%M:%S') AS floor_15m,
        |  STRFTIME(TO_TIMESTAMP(CEIL(EPOCH(CAST(ts AS TIMESTAMP)) / 900) * 900),
        |    '%Y-%m-%d %H:%M:%S') AS ceil_15m,
        |  STRFTIME(TO_TIMESTAMP(FLOOR(EPOCH(CAST(ts AS TIMESTAMP)) / 3600) * 3600),
        |    '%Y-%m-%d %H:%M:%S') AS floor_1h
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    "q53b_tz_convert" ->
      """SELECT event_id,
        |  STRFTIME((CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
        |    AT TIME ZONE 'America/New_York', '%Y-%m-%d %H:%M:%S') AS ny_wall,
        |  STRFTIME((CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
        |    AT TIME ZONE 'Asia/Kolkata', '%Y-%m-%d %H:%M:%S') AS kolkata_wall,
        |  STRFTIME((CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
        |    AT TIME ZONE 'Australia/Sydney', '%Y-%m-%d %H:%M:%S') AS sydney_wall,
        |  STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS roundtrip_utc
        |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin,

    "q53_dt_arith" ->
      """SELECT o_orderkey,
        |  DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
        |  STRFTIME(o_orderdate + INTERVAL 3 DAY, '%Y-%m-%d %H:%M:%S') AS plus3d,
        |  STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2mo,
        |  STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        |  EPOCH_US(o_orderdate) // 1000000 AS epoch_s,
        |  EPOCH_MS(o_orderdate) AS epoch_ms
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q54_dt_parse" ->
      """SELECT o_orderkey,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS date_str,
        |  STRFTIME(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'), '%Y-%m-%d %H:%M:%S') AS parsed,
        |  YEAR(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS parsed_year
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q54b_dt_parse_coerce" ->
      """WITH t AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'xx-' || CAST(o_orderkey AS VARCHAR)
        |         ELSE STRFTIME(o_orderdate, '%Y-%m-%d') END AS raw
        |  FROM orders WHERE o_orderkey % 149 = 0)
        |SELECT o_orderkey, raw,
        |  STRFTIME(TRY_STRPTIME(raw, '%Y-%m-%d'), '%Y-%m-%d %H:%M:%S') AS parsed,
        |  TRY_STRPTIME(raw, '%Y-%m-%d') IS NULL AS coerced_null
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "q55_dt_bucket" ->
      """SELECT (EPOCH_US(CAST(ts AS TIMESTAMP)) // 1000000 // 300) * 300 AS bucket_s,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
        |FROM events GROUP BY bucket_s ORDER BY bucket_s""".stripMargin,

    // DuckDB has no next_day: date + ((7 - isodow) % 7) + 1 lands on the
    // strictly-next Monday. add_months ≡ + INTERVAL (both clamp to
    // month end); date_trunc('week') starts Monday in both engines.
    "q56_dt_boundaries" ->
      """SELECT o_orderkey,
        |  STRFTIME(CAST(o_orderdate AS DATE) + CAST(((7 - ISODOW(o_orderdate)) % 7) + 1 AS INTEGER), '%Y-%m-%d') AS next_mon,
        |  STRFTIME(LAST_DAY(o_orderdate), '%Y-%m-%d') AS month_end,
        |  STRFTIME(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2m,
        |  STRFTIME(DATE_TRUNC('week', o_orderdate), '%Y-%m-%d') AS week_start,
        |  CAST((YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1 AS INTEGER) AS months_since_95
        |FROM orders WHERE o_orderkey % 149 = 0 ORDER BY o_orderkey""".stripMargin,

    "q57b_resample_ohlc" ->
      """WITH e AS (SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
        |    ts, event_id, value FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn_o,
        |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts DESC, event_id DESC) AS rn_c
        |  FROM e)
        |SELECT STRFTIME(bucket, '%Y-%m-%d %H:%M:%S') AS h,
        |  MIN(CASE WHEN rn_o = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MIN(CASE WHEN rn_c = 1 THEN value END) AS close,
        |  COUNT(*) AS n
        |FROM r GROUP BY bucket ORDER BY h""".stripMargin,

    // ns-parquet ts: cast the trunc to µs TIMESTAMP so generate_series
    // and the join key agree on type
    "q57_dt_resample" ->
      """WITH e AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, COUNT(*) AS n,
        |    ROUND(AVG(value), 4) AS avg_value FROM e GROUP BY 1),
        |cal AS (SELECT unnest(generate_series((SELECT min(bucket) FROM b),
        |    (SELECT max(bucket) FROM b), INTERVAL 1 HOUR)) AS bucket)
        |SELECT STRFTIME(cal.bucket, '%Y-%m-%d %H:%M:%S') AS h, COALESCE(b.n, 0) AS n, b.avg_value,
        |  last_value(b.avg_value IGNORE NULLS) OVER (ORDER BY cal.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_filled
        |FROM cal LEFT JOIN b USING (bucket) ORDER BY h""".stripMargin,

    "q183_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id % 7 = 0),
        |m AS (SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER w AS prev_type,
        |    ROW_NUMBER() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT user_id, ts, event_id, event_type FROM m
        |  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type, ts AS vf,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
        |  FROM c)
        |SELECT user_id, event_type,
        |  STRFTIME(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  STRFTIME(vt, '%Y-%m-%d %H:%M:%S') AS valid_to
        |FROM v ORDER BY user_id, valid_from""".stripMargin,

    "q210_point_in_time_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id % 7 = 0),
        |m AS (SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER w AS prev_type,
        |    ROW_NUMBER() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT user_id, ts, event_id, event_type FROM m
        |  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type AS regime, ts AS vf,
        |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
        |  FROM c),
        |f AS (SELECT user_id, event_id, ts FROM e
        |  WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id,
        |  STRFTIME(f.ts, '%Y-%m-%d %H:%M:%S') AS ts, v.regime,
        |  STRFTIME(v.vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  STRFTIME(v.vt, '%Y-%m-%d %H:%M:%S') AS valid_to
        |FROM f LEFT JOIN v ON f.user_id = v.user_id
        |  AND f.ts >= v.vf AND (v.vt IS NULL OR f.ts < v.vt)
        |ORDER BY f.user_id, f.event_id""".stripMargin,

    "q269_seasonal_backtest" ->
      """WITH daily AS (SELECT event_type AS k,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |j AS (SELECT a.k, a.cents - f.cents AS err, a.cents
        |  FROM daily a JOIN daily f ON f.k = a.k AND f.d = a.d - 7),
        |agg AS (SELECT k AS event_type, CAST(COUNT(*) AS BIGINT)
        |      AS n_scored,
        |    CAST(SUM(err) AS BIGINT) AS sum_err_cents,
        |    CAST(SUM(ABS(err)) AS BIGINT) AS sum_abs_err_cents,
        |    CAST(SUM(ABS(cents)) AS BIGINT) AS sum_abs_actual_cents
        |  FROM j GROUP BY 1)
        |SELECT event_type, n_scored, sum_err_cents, sum_abs_err_cents,
        |  sum_abs_actual_cents,
        |  (1000 * sum_abs_err_cents) // n_scored AS mae_milli,
        |  CASE WHEN sum_abs_actual_cents = 0 THEN NULL
        |    ELSE (1000000 * sum_abs_err_cents) // sum_abs_actual_cents
        |  END AS wape_ppm
        |FROM agg ORDER BY event_type""".stripMargin,

    "q208_cadence" ->
      """WITH e AS (SELECT user_id, event_id,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
        |l AS (SELECT user_id, t_us,
        |    LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
        |      AS next_us FROM e),
        |g AS (SELECT user_id, (next_us - t_us) // 1000000 AS g FROM l
        |  WHERE next_us IS NOT NULL),
        |a AS (SELECT user_id, COUNT(*) AS n_gaps,
        |    CAST(SUM(g) AS BIGINT) AS s,
        |    CAST(SUM(g * g) AS BIGINT) AS ssq
        |  FROM g GROUP BY user_id)
        |SELECT user_id, n_gaps, s // n_gaps AS mean_gap_s,
        |  CAST(FLOOR(10000.0 * SQRT(CAST(n_gaps * ssq - s * s AS DOUBLE))
        |    / CAST(s AS DOUBLE)) AS BIGINT) AS cv_bp
        |FROM a WHERE s > 0 ORDER BY user_id""".stripMargin,

    "q236_trailing_distinct" ->
      // same fan-out replay: distinct (day, user), explode each pair
      // to the 7 window-end days it feeds, re-distinct, count; only
      // observed days reported
      """WITH dk AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |obs AS (SELECT DISTINCT day FROM dk),
        |contrib AS (SELECT DISTINCT dk.day + CAST(g.i AS INTEGER) AS wday,
        |    dk.user_id
        |  FROM dk CROSS JOIN (SELECT unnest(range(7)) AS i) g)
        |SELECT STRFTIME(c.wday, '%Y-%m-%d') AS day, COUNT(*) AS u7
        |FROM contrib c JOIN obs ON c.wday = obs.day
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q316_seasonal_by" ->
      """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL
        |    AND event_type IS NOT NULL),
        |sl AS (SELECT event_type, EPOCH_US(ts) // 1000000 // 3600 AS slot,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2),
        |v AS (SELECT event_type, slot, n_events,
        |    CAST((s - ((s % n_events + n_events) % n_events)) // n_events
        |      AS BIGINT) AS v_c FROM sl),
        |tw AS (SELECT event_type, slot, n_events, v_c,
        |    COUNT(*) OVER wn AS wn,
        |    CAST(SUM(v_c) OVER wn AS BIGINT) AS ws
        |  FROM v WINDOW wn AS (PARTITION BY event_type ORDER BY slot
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |tr AS (SELECT event_type, slot, n_events, v_c,
        |    CASE WHEN wn = 25 THEN
        |      CAST((ws - ((ws % 25 + 25) % 25)) // 25 AS BIGINT)
        |    END AS trend_c
        |  FROM tw),
        |dt AS (SELECT event_type, slot, n_events, v_c, trend_c,
        |    v_c - trend_c AS detr, slot % 24 AS ph FROM tr),
        |se AS (SELECT event_type, ph,
        |    CAST((CAST(SUM(detr) AS BIGINT)
        |      - ((CAST(SUM(detr) AS BIGINT) % COUNT(detr) + COUNT(detr))
        |        % COUNT(detr))) // COUNT(detr) AS BIGINT) AS seasonal_c
        |  FROM dt WHERE detr IS NOT NULL GROUP BY 1, 2)
        |SELECT dt.event_type,
        |  STRFTIME(make_timestamp(dt.slot * 3600 * 1000000),
        |    '%Y-%m-%d %H:%M:%S') AS slot_ts,
        |  dt.n_events, dt.v_c, dt.trend_c,
        |  CASE WHEN dt.trend_c IS NOT NULL THEN se.seasonal_c END
        |    AS seasonal_c,
        |  dt.detr - se.seasonal_c AS resid_c
        |FROM dt LEFT JOIN se
        |  ON dt.event_type = se.event_type AND dt.ph = se.ph
        |ORDER BY dt.event_type, slot_ts""".stripMargin,

    "q298_seasonal_decompose" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |  WHERE ts IS NOT NULL AND value IS NOT NULL),
        |sl AS (SELECT EPOCH_US(ts) // 1000000 // 3600 AS slot,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
        |  FROM e GROUP BY 1),
        |v AS (SELECT slot, n_events,
        |    CAST((s - ((s % n_events + n_events) % n_events)) // n_events
        |      AS BIGINT) AS v_c FROM sl),
        |tw AS (SELECT slot, n_events, v_c,
        |    COUNT(*) OVER wn AS wn,
        |    CAST(SUM(v_c) OVER wn AS BIGINT) AS ws
        |  FROM v WINDOW wn AS (ORDER BY slot
        |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |tr AS (SELECT slot, n_events, v_c,
        |    CASE WHEN wn = 25 THEN
        |      CAST((ws - ((ws % 25 + 25) % 25)) // 25 AS BIGINT)
        |    END AS trend_c
        |  FROM tw),
        |dt AS (SELECT slot, n_events, v_c, trend_c,
        |    v_c - trend_c AS detr, slot % 24 AS ph FROM tr),
        |se AS (SELECT ph,
        |    CAST((CAST(SUM(detr) AS BIGINT)
        |      - ((CAST(SUM(detr) AS BIGINT) % COUNT(detr) + COUNT(detr))
        |        % COUNT(detr))) // COUNT(detr) AS BIGINT) AS seasonal_c
        |  FROM dt WHERE detr IS NOT NULL GROUP BY ph)
        |SELECT STRFTIME(make_timestamp(dt.slot * 3600 * 1000000),
        |    '%Y-%m-%d %H:%M:%S') AS slot_ts,
        |  dt.n_events, dt.v_c, dt.trend_c,
        |  CASE WHEN dt.trend_c IS NOT NULL THEN se.seasonal_c END
        |    AS seasonal_c,
        |  dt.detr - se.seasonal_c AS resid_c
        |FROM dt LEFT JOIN se ON dt.ph = se.ph
        |ORDER BY slot_ts""".stripMargin,

    "q206_group_ols" -> {
      import graft.ops.FrameOps
      s"""WITH e AS (SELECT user_id,
         |    CAST(ROUND(value * 100) AS BIGINT) AS y,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS BIGINT) AS x
         |  FROM events),
         |s AS (SELECT user_id, COUNT(*) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy
         |  FROM e GROUP BY user_id)
         |SELECT user_id, n,
         |  ${FrameOps.olsSlopeExpr} AS slope,
         |  ${FrameOps.olsInterceptExpr} AS intercept,
         |  ${FrameOps.olsR2Expr} AS r2
         |FROM s ORDER BY user_id""".stripMargin
    },

    "q204_decayed_engagement" ->
      s"""WITH e AS (SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS c,
         |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS t_us FROM events),
         |r AS (SELECT MAX(t_us) AS ref_us FROM e),
         |a AS (SELECT user_id, c, ref_us - t_us AS age_us FROM e, r),
         |t AS (SELECT user_id,
         |    ${graft.ops.DatetimeOps.decayTermExpr("c", "age_us",
               7L * 24 * 3600 * 1000000)} AS dc
         |  FROM a)
         |SELECT user_id, COUNT(*) AS n_events,
         |  CAST(SUM(dc) AS BIGINT) AS decayed_c
         |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q202_cusum" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, day,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
        |    CAST(SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS prefix,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |    CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |d AS (SELECT event_type, day, k, n,
        |    n * prefix - k * total AS dev,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY ABS(n * prefix - k * total) DESC, k) AS rk
        |  FROM s)
        |SELECT event_type, k AS change_pos,
        |  STRFTIME(day, '%Y-%m-%d') AS change_day,
        |  dev AS dev_n, n AS n_points
        |FROM d WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q199_twap" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(ROUND(value * 100) AS BIGINT) AS c,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS t_us
        |  FROM events),
        |l AS (SELECT user_id, c, t_us,
        |    LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
        |      AS next_us FROM e),
        |h AS (SELECT user_id, c, (next_us - t_us) // 1000 AS dms FROM l
        |  WHERE next_us IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_holds,
        |  CAST(SUM(dms) AS BIGINT) AS held_ms,
        |  CAST(SUM(c * dms) // SUM(dms) AS BIGINT) AS twap_c
        |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q200_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS t_us
        |  FROM events),
        |t AS (SELECT *, (MAX(CASE WHEN event_type <> 'purchase'
        |      THEN {'ts': ts, 'event_id': event_id,
        |            'event_type': event_type} END) OVER
        |    (PARTITION BY user_id ORDER BY t_us
        |     RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)).event_type
        |    AS src
        |  FROM e),
        |g AS (SELECT COALESCE(src, 'none') AS source,
        |    COUNT(*) AS n_conversions
        |  FROM t WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT source, n_conversions,
        |  CAST((10000 * n_conversions) // SUM(n_conversions) OVER ()
        |    AS BIGINT) AS share_bp
        |FROM g ORDER BY source""".stripMargin,

    "q186_ranking_metrics" ->
      s"""WITH e AS (SELECT user_id AS q_id, event_type AS n_id,
         |    COUNT(*) AS mc,
         |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS mv
         |  FROM events GROUP BY 1, 2),
         |ex AS (SELECT q_id, n_id, ROW_NUMBER() OVER
         |    (PARTITION BY q_id ORDER BY mc DESC, n_id) AS rnk FROM e),
         |ap AS (SELECT q_id, n_id, ROW_NUMBER() OVER
         |    (PARTITION BY q_id ORDER BY mv DESC, n_id) AS rnk FROM e),
         |e3 AS (SELECT q_id, n_id, rnk FROM ex WHERE rnk <= 3),
         |a3 AS (SELECT q_id, n_id, rnk FROM ap WHERE rnk <= 3),
         |rel AS (SELECT a3.q_id, a3.n_id, a3.rnk FROM a3
         |  JOIN e3 ON a3.q_id = e3.q_id AND a3.n_id = e3.n_id),
         |perq AS (SELECT q_id, MIN(rnk) AS first_rel,
         |    CAST(SUM(${graft.ops.Similarity.dcgGainExpr}) AS BIGINT) AS dcg_nano
         |  FROM rel GROUP BY q_id),
         |ideal AS (SELECT q_id,
         |    CAST(SUM(${graft.ops.Similarity.dcgGainExpr}) AS BIGINT) AS idcg_nano,
         |    COUNT(*) AS n_exact
         |  FROM e3 GROUP BY q_id)
         |SELECT i.q_id, i.n_exact,
         |  COALESCE(1000000 // p.first_rel, 0) AS rr_micro,
         |  COALESCE((1000000 * p.dcg_nano) // i.idcg_nano, 0) AS ndcg_micro
         |FROM ideal i LEFT JOIN perq p ON i.q_id = p.q_id
         |ORDER BY i.q_id""".stripMargin
  )
}
