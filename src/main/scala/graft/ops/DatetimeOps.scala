package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Time-decayed value sum per key as of a reference instant: each
    * event contributes `value · 2^(−age/halflife)` — the standard
    * recency-weighted engagement/activity feature (a purchase last
    * night counts ~full, one from three half-lives ago counts 1/8).
    *
    * Determinism contract: the decay factor is `ROUND(EXP(...), 6)` —
    * rounding absorbs the last-ulp libm difference between engines
    * (the [[graft.ops.Dedup.tfidfCosinePairs]] idf pin) — and each
    * event's contribution is the floor of `cents × factor`, an exact
    * double product of identical operands, summed as BIGINT. The
    * whole computation is ONE expression string ([[decayTermExpr]])
    * parsed by both engines.
    *
    * Inputs are pre-quantized: `centsCol` integral value units,
    * `ageUsCol` the event's age in microseconds at the reference
    * instant (compute as `ref_us − unix_micros(ts)`; negative ages —
    * events after the reference — are the caller's bug to avoid).
    */
  def decayedSum(df: DataFrame, keys: Seq[String], centsCol: String,
      ageUsCol: String, halflifeUs: Long): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(halflifeUs > 0, s"halflifeUs must be > 0, got $halflifeUs")
    df.selectExpr(keys :+
      (s"${decayTermExpr(centsCol, ageUsCol, halflifeUs)} AS __dc"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("__dc")).as("decayed_c"))
  }

  /** Floor-integer decay term — one string, parsed by both engines. */
  def decayTermExpr(cents: String, ageUs: String, halflifeUs: Long): String =
    s"CAST(FLOOR(CAST($cents AS DOUBLE) * ROUND(EXP(-(LN(2.0)" +
      s" / $halflifeUs.0) * CAST($ageUs AS DOUBLE)), 6)) AS BIGINT)"

  /** Classical additive SEASONAL-TREND decomposition by moving
    * averages — the drift-dashboard `decompose()` kernel the family
    * (TWAP q199, EWM q74, CUSUM q246, OLS trend q206, cadence q208)
    * was missing. Entirely integer:
    *
    *   1. bucket events to `bucketSeconds`-wide slots; slot value =
    *      floor-mean cents (positive-mod spelling, so negative sums
    *      floor identically in both engines);
    *   2. TREND = centered EQUAL-WEIGHT moving average over
    *      `period` + 1 slots (floor division; NULL until the window
    *      holds period+1 PRESENT slots — partial edge windows are
    *      bias, not data). Two documented deviations from statsmodels'
    *      textbook decompose() (r15 ADVICE item 4): (a) the window is
    *      ROWS-based over PRESENT slots, so on gappy series a "full"
    *      window can span non-contiguous, phase-imbalanced slots —
    *      the observed-slots contract below extends to the trend; on
    *      gap-free series (the gate fixtures) the two agree; (b) the
    *      endpoints carry full weight rather than the half-weight
    *      2×m convention for even periods — a constant-offset
    *      difference only when the series drifts within one period;
    *   3. SEASONAL = per-phase (slot index mod `period`) floor-mean of
    *      the detrended values across the whole series;
    *   4. RESIDUAL = value − trend − seasonal (NULL where trend is).
    *
    * Slots with no events stay absent (their phase means skip them) —
    * the observed-slots contract of [[FrameOps.trailingDistinct]].
    *
    * 100 TB posture: ONE shuffle to the slot aggregation; everything
    * after runs on the SLOT series (time-range-bounded, independent of
    * event count) — the trend window is ordered by slot over one
    * series, the classic "aggregate first, decompose the aggregate"
    * discipline. For per-key dashboards partition the windows by the
    * key; the global form keeps the gate simple.
    *
    * @return (slot_ts, n_events, v_c, trend_c, seasonal_c, resid_c)
    */
  def seasonalDecompose(df: DataFrame, ts: String, valueCol: String,
      bucketSeconds: Long = 3600L, period: Int = 24): DataFrame =
    seasonalDecomposeCore(df, None, ts, valueCol, bucketSeconds, period)

  /** Per-SERIES [[seasonalDecompose]] — the scalable form its
    * scaladoc names: every window PARTITIONS by the series key, so a
    * million dashboards decompose in one pass with no single-partition
    * stage anywhere. Identical integer arithmetic per series.
    *
    * @return (series, slot_ts, n_events, v_c, trend_c, seasonal_c,
    *         resid_c)
    */
  def seasonalDecomposeBy(df: DataFrame, series: String, ts: String,
      valueCol: String, bucketSeconds: Long = 3600L,
      period: Int = 24): DataFrame =
    seasonalDecomposeCore(df, Some(series), ts, valueCol, bucketSeconds,
      period)

  /** FROZEN per-phase baseline for [[graft.streaming.Streams
    * .seasonalBaselineStream]]: floor-mean slot value (cents) per
    * phase (slot mod period) over a reference slice — the
    * seasonal-naive profile. `period` longs, collected by contract
    * (the q214/q294 frozen-reference pattern). Phases absent from the
    * reference fall back to the GLOBAL floor-mean slot value.
    */
  def seasonalProfile(df: DataFrame, ts: String, valueCol: String,
      bucketSeconds: Long = 3600L, period: Int = 24): Seq[Long] = {
    require(period >= 1 && period <= 10000, s"bad period $period")
    val slots = df
      .filter(col(ts).isNotNull && col(valueCol).isNotNull)
      .select(
        expr(s"unix_micros($ts) div 1000000 div $bucketSeconds")
          .as("slot"),
        round(col(valueCol) * 100).cast("long").as("c"))
      .groupBy(col("slot"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      .withColumn("v_c", expr("(s - pmod(s, n)) div n"))
      .withColumn("ph", pmod(col("slot"), lit(period.toLong)))
    val perPhase = slots.groupBy(col("ph"))
      .agg(sum(col("v_c")).as("vs"), count(lit(1)).as("vn"))
      .withColumn("base", expr("(vs - pmod(vs, vn)) div vn"))
      .select(col("ph"), col("base"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val global = slots.agg(sum(col("v_c")).as("vs"), count(lit(1)).as("vn"))
      .selectExpr("(vs - pmod(vs, vn)) div vn").collect().head.getLong(0)
    (0 until period).map(p => perPhase.getOrElse(p, global))
  }

  private def seasonalDecomposeCore(df: DataFrame, series: Option[String],
      ts: String, valueCol: String,
      bucketSeconds: Long, period: Int): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0")
    require(period >= 2 && period % 2 == 0,
      s"period must be even and >= 2, got $period")
    val half = period / 2
    val keyCols = series.toSeq
    val baseSel = keyCols.map(k => col(k).as("__srs")) ++ Seq(
      expr(s"unix_micros($ts) div 1000000 div $bucketSeconds")
        .as("slot"),
      round(col(valueCol) * 100).cast("long").as("c"))
    val grpSlot = (if (series.isDefined) Seq(col("__srs")) else Nil) :+
      col("slot")
    val slots = df
      .filter(col(ts).isNotNull && col(valueCol).isNotNull &&
        series.map(k => col(k).isNotNull).getOrElse(lit(true)))
      // Column `/` is DOUBLE division — `div` keeps the slot integral
      .select(baseSel: _*)
      .groupBy(grpSlot: _*)
      .agg(count(lit(1)).as("n_events"), sum(col("c")).as("s"))
      .withColumn("v_c", expr("(s - pmod(s, n_events)) div n_events"))
    val w0 = series
      .map(_ => org.apache.spark.sql.expressions.Window
        .partitionBy(col("__srs")))
      .getOrElse(org.apache.spark.sql.expressions.Window
        .partitionBy())
      .orderBy(col("slot")).rowsBetween(-half, half)
    val trended = slots
      .withColumn("__wn", count(lit(1)).over(w0))
      .withColumn("__ws", sum(col("v_c")).over(w0))
      .withColumn("trend_c",
        when(col("__wn") === period + 1,
          expr(s"(__ws - pmod(__ws, ${period + 1})) div ${period + 1}")))
      .withColumn("detr", col("v_c") - col("trend_c"))
    val phase = trended.withColumn("ph", pmod(col("slot"), lit(period.toLong)))
    val phKey = (if (series.isDefined) Seq(col("__srs")) else Nil) :+
      col("ph")
    val seasonal = phase.filter(col("detr").isNotNull)
      .groupBy(phKey: _*)
      .agg(sum(col("detr")).as("ds"), count(lit(1)).as("dn"))
      .withColumn("seasonal_c", expr("(ds - pmod(ds, dn)) div dn"))
      .select(phKey :+ col("seasonal_c"): _*)
    val joinKeys = (if (series.isDefined) Seq("__srs") else Nil) :+ "ph"
    val outCols =
      series.map(k => col("__srs").as(k)).toSeq ++ Seq(
        timestamp_seconds(col("slot") * bucketSeconds).as("slot_ts"),
        col("n_events"), col("v_c"), col("trend_c"),
        when(col("trend_c").isNotNull, col("seasonal_c")).as("seasonal_c"),
        (col("detr") - col("seasonal_c")).as("resid_c"))
    // global tier: the period-row frame broadcasts; per-series: the
    // |series|·period frame may outgrow a broadcast — let AQE pick
    // (the (series, ph) equi-join co-partitions either way)
    val seasonalSide = if (series.isDefined) seasonal else broadcast(seasonal)
    phase.join(seasonalSide, joinKeys, "left")
      .select(outCols: _*)
  }
}
