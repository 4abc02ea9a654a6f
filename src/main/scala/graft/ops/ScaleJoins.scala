package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join strategies for shapes that defeat Spark's built-in planner at
  * 100 TB (SURVEY §7.4 "skew/shuffle" risks; the reference handles none
  * of these — dask-cudf plans every merge as a plain hash shuffle):
  *
  *  - [[bloomSemiJoin]] — membership prefilter for fact⋈small-ish dim
  *    semi-joins where the dim is too big to broadcast as a hash table
  *    but its BLOOM SKETCH (a few MB at 1% fpp) is not. The fact side is
  *    filtered BEFORE its shuffle; the exact semi-join afterwards only
  *    sees survivors, so results stay exact while shuffle volume drops
  *    to matches + fpp·misses.
  *  - [[rangeJoinBinned]] — point-in-interval equi-binned join. Spark
  *    plans `p BETWEEN lo AND hi` as BroadcastNestedLoopJoin (O(N·M));
  *    binning turns it into an equi-shuffle join on the bin id with the
  *    interval replicated only to bins it overlaps.
  *  - [[sessionize]] — gap-based batch sessionization (the batch twin of
  *    q112's streaming session windows): one keyed window, no joins.
  */
object ScaleJoins {

  /** Exact left-semi join with a broadcast Bloom prefilter on the fact
    * side. `expectedItems`/`fpp` size the sketch (1M keys at 1% ≈ 1.2 MB
    * — broadcastable when the dim's hash table is not). The trailing
    * semi-join removes the false positives, so output = plain semi-join.
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "leftsemi")
  }

  /** Point-in-interval join: rows of `points` matched to every interval
    * `[lo, hi]` of `intervals` that contains `point`. Both sides are
    * bucketed into fixed-width bins of `binWidth`; an interval is
    * replicated to each bin it overlaps, a point lands in exactly one
    * bin, so each qualifying pair meets exactly once (no dedup needed)
    * and the join is a plain equi-shuffle on the bin id + residual
    * predicate. Replication factor = avg interval span / binWidth —
    * pick binWidth ≈ the typical span.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pBin = floor(col(pointCol) / binWidth).cast("long")
    // guard inverted intervals (lo > hi): sequence(start > stop) throws
    // at runtime — one malformed row must yield zero matches (the
    // cross-filter semantics), not kill the job
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val iv = intervals.withColumn("bin",
      explode(when(col(loCol) <= col(hiCol), sequence(loBin, hiBin))
        .otherwise(array().cast("array<long>"))))
    points.withColumn("bin", pBin)
      .join(iv, Seq("bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("bin")
  }

  /** Interval×interval OVERLAP join: pairs (a, b) with
    * a.lo <= b.hi AND b.lo <= a.hi. Both sides replicate to the fixed
    * bins they span; a qualifying pair shares at least one bin, and the
    * duplicate-emission problem (pairs sharing MANY bins) is solved
    * without a distinct: emit only in the pair's FIRST common bin,
    * max(floor(a.lo/w), floor(b.lo/w)) — each qualifying pair meets
    * exactly once. One equi-shuffle on the bin id; replication factor =
    * avg span / binWidth per side.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String, tag: String): DataFrame = {
      val loBin = floor(col(lo) / binWidth).cast("long")
      val hiBin = floor(col(hi) / binWidth).cast("long")
      df.withColumn(s"__lobin_$tag", loBin)
        .withColumn("__bin",
          explode(when(col(lo) <= col(hi), sequence(loBin, hiBin))
            .otherwise(array().cast("array<long>"))))
    }
    binned(left, lLo, lHi, "l")
      .join(binned(right, rLo, rHi, "r"), Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === greatest(col("__lobin_l"), col("__lobin_r")))
      .drop("__bin", "__lobin_l", "__lobin_r")
  }

  /** Gap-based sessionization: a new session starts when the time since
    * the user's previous event exceeds `gapSec`. Emits the input plus
    * `session_idx` (1-based per user). One hash shuffle on the user key;
    * state per partition is a single lag — the batch counterpart of
    * Structured Streaming's `session_window` (q112).
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapUs = lit(gapSec * 1000000L)
    df.withColumn("prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col(tsCol)) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(w))
      .drop("prev_us", "new_sess")
  }

  /** Per-session rollup over [[sessionize]] output: event count, span
    * seconds, total `valueCol`. Same single shuffle (session_idx is a
    * function of the user partition), map-side combined.
    */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
      gapSec: Long, valueCol: String): DataFrame =
    sessionize(df, userCol, tsCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        ((max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))) / 1000000L)
          .cast("long").as("span_sec"),
        round(sum(col(valueCol)), 2).as("total_value"))

  /** Ordered-sequence FUNNEL: per user, the earliest order-respecting
    * completion of `steps` — t₁ = min ts of step 1, tᵢ = min ts of
    * step i STRICTLY AFTER tᵢ₋₁ (the greedy matching, which is optimal
    * for "did the user complete the sequence": if any completion
    * exists, the greedy one exists). Emits one row per user who
    * reached step 1: (user, depth = furthest step reached, t_first,
    * t_last, span_sec). Conversion per depth is a groupBy away.
    *
    * Scale shape: one groupBy per step over ONLY that step's events
    * (filter pushed to the scan) joined to the ≤|users|-row frontier —
    * S−1 keyed joins of user-level frames, never a per-user event
    * sort; no window over raw events. Greedy tᵢ is deterministic
    * (min of timestamps), so the whole funnel hash-gates.
    */
  def funnelSteps(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 16,
      s"steps must be 1..16 entries, got ${steps.size}")
    require(steps.distinct == steps, "funnel steps must be distinct")
    val byStep = steps.zipWithIndex.map { case (s, i) =>
      df.filter(col(typeCol) === s)
        .select(col(userCol).as("u"), unix_micros(col(tsCol)).as(s"ts$i"))
    }
    // frontier: (u, t_first, t_i) for users alive at step i
    var frontier = byStep.head.groupBy(col("u"))
      .agg(min(col("ts0")).as("t0"))
      .select(col("u"), col("t0").as("t_first"), col("t0").as("t_cur"),
        lit(1).as("depth"))
    var i = 1
    while (i < steps.size) {
      // only users who completed exactly i steps are eligible — a user
      // stalled earlier must not advance on a later step type
      val alive = frontier.filter(col("depth") === i)
        .select(col("u"), col("t_cur"))
      val nxt = byStep(i).join(alive, "u")
        .filter(col(s"ts$i") > col("t_cur"))
        .groupBy(col("u")).agg(min(col(s"ts$i")).as("t_nxt"))
      frontier = frontier.join(nxt, Seq("u"), "left")
        .select(col("u"), col("t_first"),
          coalesce(col("t_nxt"), col("t_cur")).as("t_cur"),
          (col("depth") + when(col("t_nxt").isNotNull, 1).otherwise(0))
            .as("depth"))
      i += 1
    }
    frontier.select(col("u").as(userCol), col("depth"),
      timestamp_micros(col("t_first")).as("t_first"),
      timestamp_micros(col("t_cur")).as("t_last"),
      ((col("t_cur") - col("t_first")) / 1000000L).cast("long").as("span_sec"))
  }

  /** Event-sequence MOTIF mining — the behavior-discovery complement of
    * [[funnelSteps]] (a funnel checks a KNOWN sequence; motifs surface
    * the sequences worth checking): per user, every run of `n`
    * consecutive event types in (ts, tiebreak) order becomes a
    * "a>b>c" motif; the report counts occurrences and distinct users
    * per motif. Consecutive means adjacent in the user's ordered
    * stream — gaps are not skipped (the classic n-gram-over-sessions
    * formulation; sessionize first via [[sessionize]] to break motifs
    * at session boundaries).
    *
    * Determinism contract: (`tsCol`, `tiebreak`) must uniquely order
    * each user's events (the [[graft.ops.FrameOps.ewmMean]] contract);
    * then every motif string is exact and the report hash-gates.
    *
    * 100 TB posture: ONE hash shuffle on the user key feeds the lead
    * window, then one map-side-combined motif agg — no joins, no
    * per-user collect; motif cardinality is bounded by |event types|^n,
    * tiny for real type vocabularies.
    *
    * @return (motif, n_occurrences, n_users), the full motif census
    */
  def sequenceMotifs(df: DataFrame, userCol: String, tsCol: String,
      tiebreak: String, typeCol: String, n: Int = 3): DataFrame = {
    require(n >= 2 && n <= 5, s"n must be in [2, 5], got $n")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreak))
    val steps = (0 until n).map {
      case 0 => col(typeCol)
      case i => lead(col(typeCol), i).over(w)
    }
    df.filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .withColumn("__motif", concat_ws(">", steps: _*))
      // windows can't sit in a filter: materialize the run-complete
      // marker first (a null LAST lead = truncated run; middle leads
      // can't be null once null-typed rows are filtered above)
      .withColumn("__complete", steps.last.isNotNull)
      .filter(col("__complete"))
      .groupBy(col("__motif").as("motif"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(userCol)).as("n_users"))
  }
}
