package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.streaming.Streams

/** Streaming surface — SURVEY.md §2.11 / M5, replayed deterministically.
  *
  * Each query drains the events file-stream to completion through the
  * memory sink (Streams.runToBatch) and returns the emitted rows as a
  * batch DataFrame, so the driver's DuckDB gate can hash-compare them.
  * The oracles restate append-mode emission in SQL: a window/session is
  * in the final output iff its end <= final watermark = max(ts) - delay.
  *
  * custreamz (the reference) cannot express any of this — it has
  * processing-time windows only and no late-data story [python/custreamz/
  * custreamz/kafka.py]; SURVEY §2.11 marks Structured Streaming as a
  * strict superset.
  */
object StreamingQueries extends QueryGroup {

  /** DuckDB: `ts` cast to µs timestamp; watermark = max(ts) - 600 s. */
  private val ctes =
    """e AS (SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |mx AS (SELECT MAX(ts) AS m FROM e)""".stripMargin

  override def queries: Map[String, Q] = Map(
    // tumbling 5-min window count/sum with 10-min watermark (append)
    "q110_stream_tumbling" -> ((s, d) => {
      Streams.runToBatch(s, Streams.tumblingAgg(Streams.eventsStream(s, d)),
          "q110_tumbling")
        .orderBy(col("w_start"))
    }),

    // exact distinct users per tumbling window (NEW r8): chained
    // stateful ops — windowed dropDuplicates feeding a windowed count
    // (streaming COUNT(DISTINCT) has no direct form; this is the
    // exact composition, not the approx fallback)
    "q197_stream_distinct_users" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.distinctUsersPerWindow(Streams.eventsStream(s, d)),
          "q197_distinct")
        .orderBy(col("w_start"))
    }),

    // streaming PSI drift monitor (NEW r9, r10: reference factored
    // through Validate.psiReferenceCounts): per-5-min-window PSI of
    // the purchase-value stream against the FROZEN click-value
    // reference distribution (q189's ladder) — the deploy-time drift
    // alert as a LIVE query. One stateful window agg with per-bucket
    // conditional counts in-row; the reference enters
    // psiDriftStream as a literal count vector, computed ONCE here
    // (and in production frozen across monitor restarts — the spec
    // covers the literal-vector path with no batch scan at all)
    // streaming FK-orphan monitor (NEW r12): per-window referential-
    // integrity rate of the live stream vs a FROZEN dimension snapshot
    // (missing every %3 user, so orphans are guaranteed) — stateless
    // broadcast left join + windowed conditional counts
    "q254_stream_fk_orphans" -> ((s, d) => {
      val dim = graft.Tables.events(s, d)
        .filter(col("user_id") % 3 =!= 0)
        .select(col("user_id")).distinct()
      Streams.runToBatch(s,
          Streams.fkOrphanStream(Streams.eventsStream(s, d), dim,
            "user_id", "user_id"),
          "q254_fk_orphans")
        .orderBy(col("w_start"))
    }),

    // streaming OOV-rate monitor (NEW r14): q277 Categorify's live
    // companion — per closed window, known/OOV/null splits against a
    // frozen 3-type reference vocabulary (purchase/error land OOV);
    // 4 longs of state, vocabulary broadcast, never shuffles by
    // category
    "q279_stream_oov_rate" -> ((s, d) => {
      import s.implicits._
      val ref = Seq("view", "click", "signup").toDF("v")
      Streams.runToBatch(s,
          Streams.oovRateStream(Streams.eventsStream(s, d), "event_type", ref),
          "q279_oov")
        .orderBy(col("w_start"))
    }),

    // streaming z-score anomaly monitor (NEW r14): q280's serve-time
    // path live — frozen fit stats (mean 5000c, std 4800c — the
    // feature-store posture: stats frozen at fit time) score each
    // event's integer z; per closed window the 3-sigma breach count,
    // share and worst |z|; 4 longs of state
    "q285_stream_zscore_anomaly" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.zscoreAnomalyStream(Streams.eventsStream(s, d),
            col("value"), meanC = 5000L, stdC = 4800L,
            threshBp = 30000L),
          "q285_zscore")
        .orderBy(col("w_start"))
    }),

    // streaming calibration monitor (NEW r14, verdict item 6): per
    // closed window, the count-weighted ECE over 10 fixed score
    // buckets + the worst bucket — q262's reliability readout as a
    // live alarm; 3*10+1 longs of in-row state, all-integer
    // projection, hash-gated against the batch arithmetic replayed
    // per window in DuckDB
    "q262b_stream_ece" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.eceStream(
            Streams.eventsStream(s, d).filter(col("value").isNotNull),
            least(greatest(col("value") / 200.0, lit(0.0)), lit(1.0)),
            (col("event_type") === "purchase").cast("long")),
          "q262b_ece")
        .orderBy(col("w_start"))
    }),

    // streaming Benford first-digit monitor (NEW r12): per-window
    // digit-share ladder vs the Benford expectation — the live fraud/
    // corrupted-feed alarm; 10 longs of state per open window, integer
    // obs_bp/deviation projection replays bit-for-bit
    "q249_stream_benford" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.benfordStream(Streams.eventsStream(s, d)),
          "q249_benford")
        .orderBy(col("w_start"))
    }),

    // streaming CUSUM change-point monitor (NEW r12): per (hour window
    // x event_type) series, the mean-shift vertex argmax|n*prefix -
    // k*total| in pure integers over cents — the buffered-fold shape
    // at window granularity (state = the window's events per series,
    // re-folded per batch; max-n_points emission == the batch fold in
    // any arrival order)
    "q246_stream_cusum" -> ((s, d) => {
      val res = Streams.runToBatch(s,
        Streams.cusumStream(Streams.eventsStream(s, d)), "q246_cusum",
        outputMode = "update")
      res.groupBy(col("w_start"), col("series"))
        .agg(max(struct(col("n_points"), col("change_pos"),
          col("change_at_us"), col("dev_n"))).as("f"))
        .select(col("w_start"), col("series"),
          col("f.n_points").as("n_points"),
          col("f.change_pos").as("change_pos"),
          col("f.change_at_us").as("change_at_us"),
          col("f.dev_n").as("dev_n"))
        .orderBy(col("w_start"), col("series"))
    }),

    // exact-at-close CUSUM (NEW r14, verdict item 5): q246's vertex
    // with the buffer folded ONCE at window close (event-time timer)
    // instead of every touched batch — true append semantics, one row
    // per closed series; only watermark-closed windows emit, which the
    // oracle replays with the strict (start + win + delay <
    // maxTs − delay) timer decidability filter
    "q246c_stream_cusum_close" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.cusumStreamAtClose(Streams.eventsStream(s, d)),
          "q246c_cusumc")
        .orderBy(col("w_start"), col("series"))
    }),

    // streaming SRM monitor (NEW r13): the q257 assignment audit per
    // closed window — a broken splitter alarms in its FIRST window;
    // |arms|+1 longs of in-row state, q257's integer/rounded-double
    // arithmetic verbatim
    "q272_stream_srm" -> ((s, d) => {
      val ev = Streams.eventsStream(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("arm", when(col("user_id") % 97 === 0, "junk")
          .when(col("user_id") % 10 < 5, "control")
          .otherwise("treatment"))
      Streams.runToBatch(s,
          Streams.srmStream(ev, "arm",
            Seq(("control", 1L), ("treatment", 1L)),
            size = "60 minutes"),
          "q272_srm")
        .orderBy(col("w_start"), col("arm"))
    }),

    // streaming integrity fingerprint (NEW r13): per closed window,
    // row count + XOR/SUM of the shared polynomial row hash over
    // (event_id, user_id, event_type, cents) — both folds commutative,
    // so the closed window equals the batch fold in any arrival order;
    // the live duplicate-delivery detector at the ingest door
    "q268_stream_fingerprint" -> ((s, d) => {
      val ev = Streams.eventsStream(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      Streams.runToBatch(s,
          Streams.fingerprintStream(ev,
            Seq("event_id", "user_id", "event_type", "cents")),
          "q268_fp")
        .orderBy(col("w_start"))
    }),

    // the SCALE tier of q246 (NEW r13): CUSUM at bucket granularity —
    // per (hour window x series), events fold into 16 per-bucket
    // (count, cent-sum) pairs IN-ROW (one windowed agg, no buffered
    // state, no fail-fast cap), and the boundary with max |n*prefix -
    // k*total| is a stateless projection. The boundary dev is the
    // EXACT dev_k at k = events-before-boundary (within-bucket order
    // cancels), so the whole frame hash-gates; append mode emits
    // closed windows only
    "q246b_stream_cusum_bucket" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.cusumBucketStream(Streams.eventsStream(s, d)),
          "q246b_cusumb")
        .orderBy(col("w_start"), col("series"))
    }),

    // per-series streaming quantile monitor (NEW r13): q245 keyed by
    // event_type — the per-endpoint latency dashboard; in-row ladder
    // state per open (window, series), same batch histogram arithmetic
    "q245b_stream_quantiles_by" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.quantileStreamBy(Streams.eventsStream(s, d),
            "event_type", lo = 0.0, hi = 200.0, nBuckets = 16,
            qs = Seq(0.5, 0.95, 0.99)),
          "q245b_quantby")
        .orderBy(col("w_start"), col("series"))
    }),

    // streaming per-window quantile monitor (NEW r12): live p50/p95/
    // p99 of the value column — ladder-width IN-ROW bucket counts per
    // window (state = 16 longs per open window, the psiDriftStream
    // shape), quantile walk as a stateless projection via the SAME
    // histogram arithmetic as batch q192/q203, so every closed window
    // replays bit-for-bit
    "q245_stream_quantiles" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.quantileStream(Streams.eventsStream(s, d),
            lo = 0.0, hi = 200.0, nBuckets = 16,
            qs = Seq(0.5, 0.95, 0.99)),
          "q245_quant")
        .orderBy(col("w_start"))
    }),

    // streaming seasonal-baseline anomaly monitor (NEW r15): the
    // detect twin of q294 — frozen per-hour-of-day click baseline
    // (seasonal-naive profile as plan literals), purchase windows
    // alarmed on |residual| > 8 dollars; 2 longs of state per window
    "q317_stream_seasonal" -> ((s, d) => {
      val profile = graft.ops.DatetimeOps.seasonalProfile(
        graft.Tables.events(s, d).filter(col("event_type") === "click"),
        "ts", "value")
      Streams.runToBatch(s,
          Streams.seasonalBaselineStream(
            Streams.eventsStream(s, d)
              .filter(col("event_type") === "purchase"),
            profile, thresholdCents = 800L),
          "q317_seasonal")
        .orderBy(col("w_start"))
    }),

    // streaming per-window AUC monitor (NEW r15): live model
    // separability at bucket granularity — 2x16 in-row label-bucket
    // counts per window, midrank rank-sum over the cells as a
    // stateless closed-row projection; the q314 arithmetic, streamed
    "q315_stream_auc" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.aucStream(Streams.eventsStream(s, d),
            least(greatest(col("value") / 200.0, lit(0.0)), lit(1.0)),
            (col("event_type") === "purchase").cast("long")),
          "q315_auc")
        .orderBy(col("w_start"))
    }),

    // streaming quantile-map drift CORRECTION (NEW r15): the live
    // detect→correct composition — q214's frozen-reference posture
    // applied to q216b's histogram matching. Reference ladder = batch
    // click distribution, frozen into plan literals; per closed
    // window every populated purchase bucket maps onto it via the
    // integer cross-multiplied CDF inversion, emitted with the
    // corrected midpoint. State per open window: 16 longs.
    "q294_stream_quantile_map" -> ((s, d) => {
      val refCounts = graft.ops.Sketches.histReferenceCounts(
        graft.Tables.events(s, d).filter(col("event_type") === "click"),
        "value", 0.0, 200.0, 16)
      val stream = Streams.eventsStream(s, d)
        .filter(col("event_type") === "purchase")
      Streams.runToBatch(s,
          Streams.quantileMapStream(stream, refCounts, 0.0, 200.0, 16),
          "q294_qmap")
        .orderBy(col("w_start"), col("bucket"))
    }),

    "q214_stream_psi_drift" -> ((s, d) => {
      val bounds = Seq(10.0, 20.0, 40.0, 80.0, 160.0)
      val refCounts = graft.ops.Validate.psiReferenceCounts(
        graft.Tables.events(s, d).filter(col("event_type") === "click"),
        "value", bounds)
      val stream = Streams.eventsStream(s, d)
        .filter(col("event_type") === "purchase")
      Streams.runToBatch(s,
          Streams.psiDriftStream(stream, refCounts, bounds), "q214_psi")
        .orderBy(col("w_start"))
    }),

    // streaming KMV distinct monitor (NEW r10): per-window approximate
    // distinct users with O(k) state per window — the scale answer to
    // q197's exact composition, whose dedup state grows with the TRUE
    // per-window cardinality. The sketch state is Sketches.kmvSketch's
    // exact contract (k smallest scrambled poly hashes), so the
    // streaming estimate is deterministic and the oracle replays it
    // in full — no tolerance. Update-mode emissions folded to the
    // final row per window by max(n_events), the q114 pattern
    // SLIDING-window streaming distinct (NEW r15): q236's rolling
    // active-user series live — 10-min windows advancing every 5, the
    // window generator fanning each event into both open windows (the
    // pair-explode kernel, streamed); O(k) sorted-hash state per open
    // window, byte-identical to the batch KMV sketch, update-mode
    // rows folded to the final per window
    "q295_stream_sliding_distinct" -> ((s, d) => {
      val res = Streams.runToBatch(s,
        Streams.kmvDistinctSlidingStream(Streams.eventsStream(s, d),
          k = 64),
        "q295_slide", outputMode = "update")
      res.groupBy(col("w_start"))
        .agg(max(struct(col("n_events"), col("n_sketch"),
          col("est_distinct"))).as("f"))
        .select(col("w_start"), col("f.n_events").as("n_events"),
          col("f.n_sketch").as("n_sketch"),
          col("f.est_distinct").as("est_distinct"))
        .orderBy(col("w_start"))
    }),

    "q220_stream_kmv_distinct" -> ((s, d) => {
      val res = Streams.runToBatch(s,
        Streams.kmvDistinctStream(Streams.eventsStream(s, d), k = 64),
        "q220_kmv", outputMode = "update")
      res.groupBy(col("w_start"))
        .agg(max(struct(col("n_events"), col("n_sketch"),
          col("est_distinct"))).as("f"))
        .select(col("w_start"), col("f.n_events").as("n_events"),
          col("f.n_sketch").as("n_sketch"),
          col("f.est_distinct").as("est_distinct"))
        .orderBy(col("w_start"))
    }),

    // streaming exact per-window top-k (NEW r11): live heavy-user
    // monitor — per-window count map in flatMapGroupsWithState, ONE
    // row per window per batch carrying the ranked "user:cnt" string
    // (sink traffic O(k), never per-key); counts are order-free so
    // the gate needs no fold-order contract; max-n_events emission
    // per window is the final state
    "q241_stream_topk" -> ((s, d) => {
      val res = Streams.runToBatch(s,
        Streams.topKStream(Streams.eventsStream(s, d), k = 10),
        "q241_topk", outputMode = "update")
      res.groupBy(col("w_start"))
        .agg(max(struct(col("n_events"), col("n_keys"), col("top_k")))
          .as("f"))
        .select(col("w_start"), col("f.n_events").as("n_events"),
          col("f.n_keys").as("n_keys"), col("f.top_k").as("top_k"))
        .orderBy(col("w_start"))
    }),

    // streaming Misra-Gries heavy hitters (NEW r12): the UNCAPPED
    // sibling of q241 — state is k counters per open window, never
    // the full key map, so it runs at any key cardinality. The live
    // MG summary proposes <= k candidates per window (a SUPERSET of
    // the true heavy hitters in ANY arrival order); one batch recount
    // over the closed window disposes, and the recounted set
    // {v: cnt*k > N} is a pure function of the window multiset — so
    // the whole result hash-gates against a plain GROUP BY / HAVING
    "q243_stream_heavy_hitters" -> ((s, d) => {
      val k = 20
      val cands = Streams.runToBatch(s,
        Streams.heavyHittersStream(Streams.eventsStream(s, d), k = k),
        "q243_hh", outputMode = "update")
        .groupBy(col("w_start"))
        .agg(max_by(col("candidates"), col("n_events")).as("cands"),
          max(col("n_events")).as("n_total"))
      val flat = cands.select(col("w_start"), col("n_total"),
        explode(col("cands")).as("user_id"))
      val ev = graft.Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .select(date_format(window(col("ts"), "300 seconds")
          .getField("start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("user_id"))
        .groupBy(col("w_start"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      ev.join(flat, Seq("w_start", "user_id"))
        .filter(col("cnt") * k > col("n_total"))
        .select(col("w_start"), col("user_id"), col("cnt"),
          col("n_total"))
        .orderBy(col("w_start"), col("user_id"))
    }),

    // streaming KMV contamination monitor (NEW r10): per-window
    // overlap of the purchase-user stream vs a FROZEN click-user
    // reference sketch (kmvSketchValues = the compute-once producer;
    // the streaming query carries only 64 literal longs — no
    // reference scan). State O(k) per window; every estimate replays
    // kmvOverlap's integer arithmetic, so the whole result hash-gates
    "q224_stream_kmv_overlap" -> ((s, d) => {
      val ref = graft.ops.Sketches.kmvSketchValues(
        graft.Tables.events(s, d).filter(col("event_type") === "click"),
        col("user_id").cast("string"), k = 64)
      val res = Streams.runToBatch(s,
        Streams.kmvOverlapStream(
          Streams.eventsStream(s, d).filter(col("event_type") === "purchase"),
          ref, k = 64),
        "q224_kmv_ov", outputMode = "update")
      res.groupBy(col("w_start"))
        .agg(max(struct(col("n_events"), col("n_sketch"), col("jaccard_bp"),
          col("est_union"), col("est_intersect"))).as("f"))
        .select(col("w_start"), col("f.n_events").as("n_events"),
          col("f.n_sketch").as("n_sketch"),
          col("f.jaccard_bp").as("jaccard_bp"),
          col("f.est_union").as("est_union"),
          col("f.est_intersect").as("est_intersect"))
        .orderBy(col("w_start"))
    }),

    // streaming LSH near-dup monitor (NEW r11): flag documents at the
    // door that share a MinHash band with an earlier doc of the same
    // ingest window (near-dup) or with a FROZEN blessed-sample band
    // table (contamination) — the fuzzy complement of q224. Band
    // arithmetic is the batch q92 construction verbatim; the reference
    // is literal (band, bkey) pairs from the compute-once producer
    // Dedup.bandKeyValues (no reference scan in the stream), so the
    // whole flagged set hash-gates against a SQL replay
    "q225_stream_near_dup" -> ((s, d) => {
      import graft.ops.Dedup
      val ref = Dedup.bandKeyValues(
        graft.Tables.documents(s, d).filter(col("doc_id") % 101 === 0),
        "doc_id", "text")
      val res = Streams.runToBatch(s,
        Streams.nearDupBandStream(Streams.documentsStream(s, d), ref),
        "q225_near_dup", outputMode = "update")
      res.orderBy(col("w_start"), col("doc_id"))
    }),

    // streaming funnel (NEW r11, contract hardened r12): live per-user
    // conversion depth for view→click→purchase — the stateful twin of
    // batch q227, gated against the SAME greedy SQL (every emission ==
    // batch op over events-so-far, any arrival order within the
    // watermark). Update emissions folded by max rev (the per-user
    // state revision counter; depth alone can't order emissions once
    // a late first-step event may move t_first earlier)
    "q230_stream_funnel" -> ((s, d) => {
      val res = Streams.runToBatch(s,
        Streams.funnelStream(Streams.eventsStream(s, d),
          Seq("view", "click", "purchase")),
        "q230_funnel", outputMode = "update")
      res.groupBy(col("user_id"))
        .agg(max(struct(col("rev"), col("depth"), col("t_first"),
          col("t_last"), col("span_sec"))).as("f"))
        .select(col("user_id"), col("f.depth").as("depth"),
          col("f.t_first").as("t_first"), col("f.t_last").as("t_last"),
          col("f.span_sec").as("span_sec"))
        .orderBy(col("user_id"))
    }),

    // sliding 10-min/5-min window per event_type
    "q111_stream_sliding" -> ((s, d) => {
      Streams.runToBatch(s, Streams.slidingAgg(Streams.eventsStream(s, d)),
          "q111_sliding")
        .orderBy(col("w_start"), col("event_type"))
    }),

    // per-user session windows, 5-min gap
    "q112_stream_session" -> ((s, d) => {
      Streams.runToBatch(s, Streams.sessionAgg(Streams.eventsStream(s, d)),
          "q112_session")
        .orderBy(col("user_id"), col("s_start"))
    }),

    // stream-static enrichment: events enriched per micro-batch by a
    // broadcast user->tier dimension, then tumbling window x tier agg
    "q118_stream_static_join" -> ((s, d) => {
      val dim = graft.Tables.events(s, d).select(col("user_id")).distinct()
        .withColumn("tier", pmod(col("user_id"), lit(5)).cast("int"))
      val enriched = Streams.staticEnrich(
          Streams.eventsStream(s, d).withWatermark("ts", "10 minutes"),
          dim, "user_id")
        .groupBy(window(col("ts"), "5 minutes"), col("tier"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("tier"), col("n"), col("sum_val"))
      Streams.runToBatch(s, enriched, "q118_static")
        .orderBy(col("w_start"), col("tier"))
    }),

    // stream-stream LEFT OUTER interval join: unmatched views surface
    // as null click_id via watermark state eviction; the gate keeps
    // only the decidable region (v_ts well before max_ts − gap −
    // delay) so batch and stream agree row-for-row
    "q119_stream_outer_join" -> ((s, d) => {
      val res = Streams.runToBatch(s,
        Streams.viewClickLeftOuter(
          Streams.eventsStream(s, d), Streams.eventsStream(s, d)),
        "q119_outer")
      val mx = graft.Tables.events(s, d)
        .agg(max(col("ts"))).first.getTimestamp(0)
      res.filter(col("v_ts") < lit(mx) - expr("INTERVAL 75 MINUTES"))
        .select(col("user_id"), col("view_id"), col("click_id"))
        .orderBy(col("user_id"), col("view_id"), col("click_id"))
    }),

    // streaming SCD2 change capture (NEW r8): flatMapGroupsWithState
    // emits each CLOSED validity interval as the closing change
    // arrives; the open tail lives in state. Emitted set == the batch
    // scd2's closed intervals (q183 kernel with valid_to NOT NULL)
    "q191_stream_scd2" -> ((s, d) => {
      val stream = Streams.scd2Stream(
        Streams.eventsStream(s, d).filter(col("user_id") % 7 === 0))
      Streams.runToBatch(s, stream, "q191_scd2")
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"))
        .orderBy(col("user_id"), col("valid_from"))
    }),

    // streaming dedup to a distinct key set (exact, unbounded state —
    // the state-bounded dropDuplicatesWithinWatermark variant is
    // exercised in StreamingSpec where single-batch replay keeps it
    // deterministic)
    "q113_stream_dedup" -> ((s, d) => {
      val stream = Streams.eventsStream(s, d)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      Streams.runToBatch(s, stream, "q113_dedup")
        .orderBy(col("user_id"), col("event_type"))
    }),

    // stream-stream interval join (view→click attribution) — two
    // watermarked sources, time-range join condition bounding state;
    // inner join + full drain = the complete batch join, so the oracle
    // is plain SQL (custreamz cannot express stream-stream joins)
    "q115_stream_stream_join" -> ((s, d) => {
      Streams.runToBatch(s,
          Streams.viewClickJoin(Streams.eventsStream(s, d), Streams.eventsStream(s, d)),
          "q115_ssjoin")
        .orderBy(col("user_id"), col("view_id"), col("click_id"))
    }),

    // streaming corpus ingest: documents stream through the quality
    // gate (min token count) and stateful content dedup — the
    // 100 TB/day pipeline front door. Dedup keys on (lang, fingerprint)
    // so the emitted SET is order-independent: whichever duplicate
    // arrives first, the surviving (lang, fp, n_tokens) triple is the
    // same (fp determines normText determines n_tokens).
    "q116_stream_corpus_ingest" -> ((s, d) => {
      import graft.ops.Dedup
      import graft.expressions.TextHashes
      val stream = Streams.documentsStream(s, d)
        .withColumn("n_tokens",
          size(split(Dedup.normText(col("text")), " ")))
        .filter(col("n_tokens") >= 20)
        .withColumn("fp", TextHashes.poly_hash(Dedup.normText(col("text"))))
        .select(col("lang"), col("fp"), col("n_tokens"))
        .dropDuplicates("lang", "fp")
      Streams.runToBatch(s, stream, "q116_ingest")
        .orderBy(col("lang"), col("fp"))
    }),

    // the subword tokenizer under Structured Streaming: the compiled
    // greedy-WordPiece UDF is stateless, so the SAME map stage runs
    // per micro-batch with no state store — gated against the SAME
    // recursive-CTE oracle as the batch q109, which makes this a
    // HASH-gated batch-vs-stream equivalence, not just a spec
    "q117_stream_subword" -> ((s, d) => {
      val stream = graft.ops.TextAnalysis.wordpieceTokenize(
        Streams.documentsStream(s, d), "doc_id", "text")
      Streams.runToBatch(s, stream, "q117_subword")
        .orderBy(col("doc_id"))
    }),

    // custom state machine: per-user event count + running max via
    // mapGroupsWithState (the groupby-apply-with-state analog the
    // reference lacks entirely). Update-mode emissions are collapsed to
    // the FINAL state per user (max of the monotone count / running max),
    // which IS SQL-expressible: total count + rounded max per user.
    "q114_stream_stateful" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val stream = Streams.eventsStream(s, d)
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (uid: Long, rows: Iterator[(Long, Double)], st: GroupState[(Long, Double)]) =>
            val (n0, mx0) = st.getOption.getOrElse((0L, Double.MinValue))
            var n = n0; var mx = mx0
            rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
            st.update((n, mx))
            (uid, n, math.round(mx * 100) / 100.0)
        }
        .toDF("user_id", "n_events", "max_value")
      Streams.runToBatch(s, stream, "q114_stateful", outputMode = "update")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"), max(col("max_value")).as("max_value"))
        .orderBy(col("user_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // the q183 batch-SCD2 kernel restricted to CLOSED intervals — the
    // streaming op can only emit an interval once its close arrives
    "q191_stream_scd2" ->
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
        |FROM v WHERE vt IS NOT NULL
        |ORDER BY user_id, valid_from""".stripMargin,
    // identical to q109's oracle: a full drain of the stateless map
    // stage must equal the batch tokenization bit-for-bit
    "q117_stream_subword" ->
      s"""WITH RECURSIVE
         |${LlmQueries.sqlWordpieceCtes}
         |SELECT t.doc_id, CAST(len(t.wl) AS INTEGER) AS n_words,
         |  CAST(coalesce(len(f.ids), 0) AS INTEGER) AS n_tokens,
         |  CAST(coalesce(len(list_filter(f.ids, x -> x = 0)), 0) AS INTEGER) AS n_unk,
         |  coalesce(array_to_string(f.ids, ' '), '') AS token_ids
         |FROM t LEFT JOIN flat f USING (doc_id) ORDER BY doc_id""".stripMargin,

    // full drain of a stateful dedup emits exactly the distinct key
    // set; fp replays HashSpec.polyHash over normalized text
    "q116_stream_corpus_ingest" ->
      """WITH t AS (SELECT lang,
        |    LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS s
        |  FROM documents),
        |q AS (SELECT lang, s, len(string_split(s, ' ')) AS n_tokens
        |  FROM t WHERE len(string_split(s, ' ')) >= 20)
        |SELECT DISTINCT lang,
        |  list_reduce(list_prepend(CAST(7 AS BIGINT),
        |    list_transform(string_split(s, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS fp,
        |  CAST(n_tokens AS INTEGER) AS n_tokens
        |FROM q ORDER BY lang, fp""".stripMargin,

    "q110_stream_tumbling" ->
      s"""WITH $ctes,
         |w AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000) AS ws,
         |             value FROM e)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
         |FROM w, mx
         |WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND
         |GROUP BY ws ORDER BY w_start""".stripMargin,

    "q241_stream_topk" ->
      // exact replay: per-(window, user) counts, rank by (cnt DESC,
      // user), top-10 folded to the same "user:cnt,…" string
      s"""WITH $ctes,
         |w AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 * 1000000) AS ws, user_id FROM e
         |  WHERE user_id IS NOT NULL),
         |c AS (SELECT ws, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM w GROUP BY 1, 2),
         |r AS (SELECT ws, user_id, cnt, ROW_NUMBER() OVER
         |    (PARTITION BY ws ORDER BY cnt DESC, user_id) AS rk FROM c),
         |a AS (SELECT ws, CAST(SUM(cnt) AS BIGINT) AS n_events,
         |    CAST(COUNT(*) AS BIGINT) AS n_keys FROM c GROUP BY ws),
         |t AS (SELECT ws, STRING_AGG(user_id || ':' || cnt,
         |    ',' ORDER BY cnt DESC, user_id) AS top_k
         |  FROM r WHERE rk <= 10 GROUP BY ws)
         |SELECT STRFTIME(a.ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  n_events, n_keys, t.top_k
         |FROM a JOIN t ON a.ws = t.ws ORDER BY w_start""".stripMargin,

    "q243_stream_heavy_hitters" ->
      // the recounted heavy-hitter set is a pure function of the
      // window multiset (MG candidates are a superset in any arrival
      // order), so the replay is the definition itself: per-(window,
      // user) counts, keep cnt * k > window total
      s"""WITH $ctes,
         |w AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 * 1000000) AS ws, user_id FROM e
         |  WHERE user_id IS NOT NULL),
         |c AS (SELECT ws, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM w GROUP BY 1, 2),
         |a AS (SELECT ws, CAST(SUM(cnt) AS BIGINT) AS n_total
         |  FROM c GROUP BY ws)
         |SELECT STRFTIME(c.ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  c.user_id, c.cnt, a.n_total
         |FROM c JOIN a ON c.ws = a.ws
         |WHERE c.cnt * 20 > a.n_total
         |ORDER BY w_start, c.user_id""".stripMargin,

    "q295_stream_sliding_distinct" -> {
      // q220's full KMV replay with the sliding fan-out: an event at t
      // feeds BOTH aligned 10-min windows covering it (starts
      // floor(t/300)·300 and that minus 300) — the pair-explode kernel
      val h = graft.ops.Sketches.kmvScrambleSql(
        graft.ops.Sketches.polyHashSql("CAST(user_id AS VARCHAR)"))
      val p = graft.expressions.HashSpec.P
      s"""WITH $ctes,
         |w AS (SELECT make_timestamp(((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 - g.i * 300) * 1000000) AS ws, user_id
         |  FROM e CROSS JOIN (SELECT unnest(range(2)) AS i) g),
         |hs AS (SELECT ws, $h AS h, COUNT(*) AS cnt
         |  FROM w GROUP BY ws, h),
         |ranked AS (SELECT ws, h, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY h) AS rk
         |  FROM hs),
         |agg AS (SELECT ws,
         |    CAST(SUM(cnt) AS BIGINT) AS n_events,
         |    CAST(SUM(CASE WHEN rk <= 64 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_sketch,
         |    MAX(CASE WHEN rk = 64 THEN h END) AS h64
         |  FROM ranked GROUP BY ws)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, n_events,
         |  n_sketch,
         |  CASE WHEN n_sketch < 64 THEN n_sketch
         |    ELSE (63 * CAST($p AS BIGINT)) // h64 END AS est_distinct
         |FROM agg ORDER BY w_start""".stripMargin
    },

    "q220_stream_kmv_distinct" -> {
      // full KMV replay per window: scrambled poly hash of the user id
      // string, k smallest per window, floor estimator — update-mode
      // state emissions fold to the final row, so every window gates
      val h = graft.ops.Sketches.kmvScrambleSql(
        graft.ops.Sketches.polyHashSql("CAST(user_id AS VARCHAR)"))
      val p = graft.expressions.HashSpec.P
      s"""WITH $ctes,
         |w AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 * 1000000) AS ws, user_id FROM e),
         |hs AS (SELECT ws, $h AS h, COUNT(*) AS cnt
         |  FROM w GROUP BY ws, h),
         |ranked AS (SELECT ws, h, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY h) AS rk
         |  FROM hs),
         |agg AS (SELECT ws,
         |    CAST(SUM(cnt) AS BIGINT) AS n_events,
         |    CAST(SUM(CASE WHEN rk <= 64 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_sketch,
         |    MAX(CASE WHEN rk = 64 THEN h END) AS h64
         |  FROM ranked GROUP BY ws)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, n_events,
         |  n_sketch,
         |  CASE WHEN n_sketch < 64 THEN n_sketch
         |    ELSE (63 * CAST($p AS BIGINT)) // h64 END AS est_distinct
         |FROM agg ORDER BY w_start""".stripMargin
    },

    // reference = top-64 scrambled hashes of DISTINCT click users
    // (what kmvSketchValues froze); per window: purchase-user sketch,
    // merged top-64, two-membership count, the kmvOverlap floor math
    "q224_stream_kmv_overlap" -> {
      val h = graft.ops.Sketches.kmvScrambleSql(
        graft.ops.Sketches.polyHashSql("CAST(user_id AS VARCHAR)"))
      val p = graft.expressions.HashSpec.P
      s"""WITH $ctes,
         |rh AS (SELECT DISTINCT $h AS h FROM e WHERE event_type = 'click'),
         |rs AS (SELECT h FROM (SELECT h,
         |    ROW_NUMBER() OVER (ORDER BY h) AS rk FROM rh) WHERE rk <= 64),
         |pw AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 * 1000000) AS ws, $h AS h, COUNT(*) AS cnt
         |  FROM e WHERE event_type = 'purchase' GROUP BY ws, h),
         |cur AS (SELECT ws, h, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY h) AS rk FROM pw),
         |c64 AS (SELECT ws, h FROM cur WHERE rk <= 64),
         |m0 AS (SELECT ws, h FROM c64
         |  UNION SELECT w.ws, rs.h FROM (SELECT DISTINCT ws FROM cur) w
         |    CROSS JOIN rs),
         |mk AS (SELECT ws, h FROM (SELECT ws, h,
         |    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY h) AS mrk FROM m0)
         |  WHERE mrk <= 64),
         |nb AS (SELECT mk.ws, CAST(COUNT(*) AS BIGINT) AS n_both FROM mk
         |  JOIN c64 ON mk.ws = c64.ws AND mk.h = c64.h
         |  JOIN rs ON mk.h = rs.h GROUP BY mk.ws),
         |ne AS (SELECT ws, CAST(SUM(cnt) AS BIGINT) AS n_events,
         |    CAST(SUM(CASE WHEN rk <= 64 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_sketch
         |  FROM cur GROUP BY ws),
         |st AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS hk
         |  FROM mk GROUP BY ws),
         |fin AS (SELECT ne.ws, ne.n_events, ne.n_sketch,
         |    (10000 * COALESCE(nb.n_both, 0)) // st.k_used AS jaccard_bp,
         |    CASE WHEN st.k_used < 64 THEN st.k_used
         |      ELSE (63 * CAST($p AS BIGINT)) // st.hk END AS est_union
         |  FROM ne JOIN st ON ne.ws = st.ws LEFT JOIN nb ON ne.ws = nb.ws)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, n_events,
         |  n_sketch, CAST(jaccard_bp AS BIGINT) AS jaccard_bp,
         |  CAST(est_union AS BIGINT) AS est_union,
         |  CAST((jaccard_bp * est_union) // 10000 AS BIGINT) AS est_intersect
         |FROM fin ORDER BY w_start""".stripMargin
    },

    // full replay of the streaming LSH monitor: the same minhash sig +
    // band-key construction as the q92 oracles, windows from the
    // synthetic timestamp_seconds(doc_id) clock, "earlier" = smaller
    // doc_id in the same window (the stream's determinism contract),
    // reference = the blessed 1-in-101 sample's distinct bands
    "q225_stream_near_dup" -> {
      val bandSelects = (0 until 4).map { b =>
        val key = (0 until 4).map(r => s"CAST(sig[${b * 4 + r + 1}] AS VARCHAR)")
          .mkString(" || '-' || ")
        s"SELECT doc_id, $b AS band, $key AS bkey FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH ${LlmQueries.sqlMinhashCtes()},
         |b0 AS MATERIALIZED ($bandSelects),
         |wd AS MATERIALIZED (SELECT doc_id,
         |    ((doc_id + 1000000) // 1000) * 1000 AS ws
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |bb AS MATERIALIZED (SELECT w.ws, b.doc_id, b.band, b.bkey
         |  FROM b0 b JOIN wd w USING (doc_id)),
         |dup AS (SELECT a.ws, a.doc_id, a.band, MIN(b.doc_id) AS peer_band
         |  FROM bb a JOIN bb b ON a.ws = b.ws AND a.band = b.band
         |    AND a.bkey = b.bkey AND b.doc_id < a.doc_id
         |  GROUP BY a.ws, a.doc_id, a.band),
         |dupagg AS (SELECT ws, doc_id, COUNT(*) AS n_dup_bands,
         |    MIN(peer_band) AS peer
         |  FROM dup GROUP BY ws, doc_id),
         |refb AS (SELECT DISTINCT band, bkey FROM b0
         |  WHERE doc_id % 101 = 0),
         |refagg AS (SELECT b.doc_id, COUNT(*) AS n_ref_bands
         |  FROM b0 b JOIN refb USING (band, bkey) GROUP BY b.doc_id),
         |fin AS (SELECT w.ws, w.doc_id,
         |    COALESCE(d.n_dup_bands, 0) AS n_dup_bands,
         |    COALESCE(d.peer, -1) AS peer,
         |    COALESCE(r.n_ref_bands, 0) AS n_ref_bands
         |  FROM wd w
         |  LEFT JOIN dupagg d ON w.ws = d.ws AND w.doc_id = d.doc_id
         |  LEFT JOIN refagg r ON w.doc_id = r.doc_id)
         |SELECT STRFTIME(make_timestamp(ws * 1000000),
         |    '%Y-%m-%d %H:%M:%S') AS w_start,
         |  doc_id, CAST(n_dup_bands AS INTEGER) AS n_dup_bands,
         |  CAST(peer AS BIGINT) AS peer,
         |  CAST(n_ref_bands AS INTEGER) AS n_ref_bands
         |FROM fin WHERE n_dup_bands > 0 OR n_ref_bands > 0
         |ORDER BY w_start, doc_id""".stripMargin
    },

    // identical to q227's oracle: a full drain of the stateful funnel
    // must equal the batch greedy chain row-for-row
    "q230_stream_funnel" -> DatetimeQueries.funnelOracleSql,

    "q254_stream_fk_orphans" ->
      s"""WITH $ctes,
         |dim AS (SELECT DISTINCT user_id AS pk FROM e
         |  WHERE user_id IS NOT NULL AND user_id % 3 != 0),
         |j AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws, e.user_id AS fk, dim.pk
         |  FROM e LEFT JOIN dim ON e.user_id = dim.pk),
         |c AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(COUNT(*) FILTER (WHERE fk IS NULL) AS BIGINT)
         |      AS n_null_fk,
         |    CAST(COUNT(*) FILTER (WHERE fk IS NOT NULL AND pk IS NULL)
         |      AS BIGINT) AS n_orphans
         |  FROM j GROUP BY ws),
         |mx2 AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS m FROM e),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, n_rows,
         |  n_null_fk, n_orphans, (10000 * n_orphans) // n_rows AS orphan_bp
         |FROM dec ORDER BY w_start""".stripMargin,

    "q279_stream_oov_rate" ->
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws, ts, event_type AS c
         |  FROM e),
         |c AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COUNT(*) FILTER (WHERE c IN ('view', 'click', 'signup'))
         |      AS BIGINT) AS n_known,
         |    CAST(COUNT(*) FILTER (WHERE c IS NOT NULL
         |      AND c NOT IN ('view', 'click', 'signup')) AS BIGINT) AS n_oov,
         |    CAST(COUNT(*) FILTER (WHERE c IS NULL) AS BIGINT) AS n_null
         |  FROM v GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM v),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  n, n_known, n_oov, n_null, (10000 * n_oov) // n AS oov_bp
         |FROM dec ORDER BY w_start""".stripMargin,

    // same integer z spelling (positive-mod floor at 1e4) on the
    // frozen literals; anomaly share over the scored (non-null) rows
    "q285_stream_zscore_anomaly" ->
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws, ts, CAST(ROUND(value * 100) AS BIGINT) AS c
         |  FROM e),
         |z AS (SELECT ws, ts, CASE WHEN c IS NULL THEN NULL ELSE
         |    ((c - 5000) * 10000
         |      - ((((c - 5000) * 10000) % 4800 + 4800) % 4800)) // 4800
         |  END AS z FROM v),
         |c2 AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(COUNT(*) FILTER (WHERE z IS NULL) AS BIGINT) AS n_null,
         |    CAST(COUNT(*) FILTER (WHERE ABS(z) >= 30000) AS BIGINT)
         |      AS n_anom,
         |    MAX(ABS(z)) AS max_abs_z
         |  FROM z GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM v),
         |dec AS (SELECT c2.* FROM c2, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  n, n_null, n_anom,
         |  CASE WHEN n - n_null = 0 THEN 0
         |    ELSE (10000 * n_anom) // (n - n_null) END AS anom_bp,
         |  max_abs_z
         |FROM dec ORDER BY w_start""".stripMargin,

    "q262b_stream_ece" -> {
      // per-bin state replay: n_b / p_b / m_b via FILTER, gap as the
      // SAME integer arithmetic (m div (100 n) vs 10000 p div n), ECE
      // as the count-weighted floor-div, worst bucket via a packed
      // (gap*100 + 99-bin) MAX — monotone-equivalent to the Spark
      // struct compare for gap in [0, 10000], bin in [0, 9]
      val nBins = 10
      val bins = 0 until nBins
      val binCtes = bins.map(b =>
        s"CAST(COUNT(*) FILTER (WHERE b = $b) AS BIGINT) AS n$b, " +
          s"CAST(COALESCE(SUM(y) FILTER (WHERE b = $b), 0) AS BIGINT) AS p$b, " +
          s"CAST(COALESCE(SUM(vm) FILTER (WHERE b = $b), 0) AS BIGINT) AS m$b")
        .mkString(", ")
      def gap(b: Int) =
        s"ABS(m$b // (100 * n$b) - (10000 * p$b) // n$b)"
      val nSum = bins.map(b => s"n$b").mkString(" + ")
      val wgSum = bins.map(b =>
        s"CASE WHEN n$b = 0 THEN 0 ELSE n$b * (${gap(b)}) END")
        .mkString(" + ")
      val packMax = "GREATEST(" + bins.map(b =>
        s"CASE WHEN n$b = 0 THEN ${-1 * 100 + (99 - b)} " +
          s"ELSE (${gap(b)}) * 100 + ${99 - b} END").mkString(", ") + ")"
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws, ts,
         |    LEAST(GREATEST(CAST(value AS DOUBLE) / 200.0, 0.0), 1.0) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM e WHERE value IS NOT NULL),
         |bn AS (SELECT ws, ts,
         |    LEAST(CAST(FLOOR(v * $nBins) AS BIGINT), ${nBins - 1}) AS b,
         |    CAST(FLOOR(v * 1000000) AS BIGINT) AS vm, y
         |  FROM v),
         |c AS (SELECT ws, $binCtes,
         |    CAST(0 AS BIGINT) AS n_oob
         |  FROM bn GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM v),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND),
         |f AS (SELECT *, $nSum AS n, $wgSum AS wg, $packMax AS pk FROM dec)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  n, n_oob,
         |  CASE WHEN n = 0 THEN -1 ELSE wg // n END AS ece_bp,
         |  CASE WHEN n = 0 THEN -1 ELSE pk // 100 END AS max_gap_bp,
         |  CASE WHEN n = 0 THEN -1 ELSE 99 - pk % 100 END AS worst_bin
         |FROM f ORDER BY w_start""".stripMargin
    },

    "q249_stream_benford" -> {
      val exp = graft.ops.Validate.benfordExpBp
      val obs = (1 to 9).map(dd =>
        s"CASE WHEN t = 0 THEN 0 ELSE (n$dd * 10000) // t END")
      val dev = obs.zip(exp).map { case (o, e) => s"ABS(($o) - $e)" }
        .mkString(" + ")
      s"""WITH $ctes,
         |vv AS (SELECT ts, ABS(CAST(value AS DOUBLE)) AS v FROM e
         |  WHERE value IS NOT NULL),
         |vd AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws,
         |    CASE WHEN v >= 0.001 AND v < 10000000.0 THEN
         |      ${graft.ops.Validate.benfordDigitExpr} ELSE -1 END AS d
         |  FROM vv),
         |c AS (SELECT ws, ${(1 to 9).map(dd =>
                s"CAST(COUNT(*) FILTER (WHERE d = $dd) AS BIGINT) AS n$dd")
                .mkString(", ")},
         |    CAST(COUNT(*) FILTER (WHERE d = -1) AS BIGINT) AS n_excluded
         |  FROM vd GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM vv),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND),
         |t AS (SELECT *, ${(1 to 9).map(dd => s"n$dd").mkString(" + ")}
         |    AS t FROM dec)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  t AS n_valid, n_excluded,
         |  CASE WHEN t = 0 THEN 0 ELSE (n1 * 10000) // t END AS d1_bp,
         |  $dev AS dev_bp
         |FROM t ORDER BY w_start""".stripMargin
    },

    "q246_stream_cusum" ->
      // exact replay: per (hour, type) series ordered by (ts,
      // event_id), cross-multiplied CUSUM dev in integers, argmax by
      // (|dev| DESC, k) — every window gates (the max-n_points fold
      // needs no decidability filter: all events arrive in the drain)
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 3600)
         |      * 3600 * 1000000) AS ws,
         |    event_type AS series, EPOCH_US(ts) AS tus, event_id,
         |    CAST(ROUND(value * 100) AS BIGINT) AS cents
         |  FROM e WHERE event_type IS NOT NULL AND value IS NOT NULL
         |    AND event_id IS NOT NULL),
         |r AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER wo AS BIGINT) AS k,
         |    SUM(cents) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS prefix,
         |    CAST(COUNT(*) OVER wp AS BIGINT) AS n,
         |    SUM(cents) OVER wp AS total
         |  FROM v
         |  WINDOW wo AS (PARTITION BY ws, series ORDER BY tus, event_id),
         |    wp AS (PARTITION BY ws, series)),
         |d AS (SELECT ws, series, n, k, tus,
         |    CAST(n * prefix - k * total AS BIGINT) AS dev FROM r)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, series,
         |  n AS n_points, k AS change_pos, tus AS change_at_us,
         |  dev AS dev_n
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY ws, series
         |    ORDER BY ABS(dev) DESC, k) AS rk FROM d)
         |WHERE rk = 1 ORDER BY w_start, series""".stripMargin,

    "q246c_stream_cusum_close" ->
      // q246's exact per-series fold, restricted to TIMER-CLOSED
      // windows: a series emits iff start + 3600s + 600s delay <
      // final watermark (max event-time ms − 600s), the strict-less
      // comparison Spark's event-time timers use
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 3600)
         |      * 3600 * 1000000) AS ws,
         |    event_type AS series, EPOCH_US(ts) AS tus, event_id,
         |    CAST(ROUND(value * 100) AS BIGINT) AS cents
         |  FROM e WHERE event_type IS NOT NULL AND value IS NOT NULL
         |    AND event_id IS NOT NULL),
         |wm AS (SELECT MAX(tus) // 1000 - 600000 AS wm_ms FROM v),
         |vc AS (SELECT v.* FROM v, wm
         |  WHERE EPOCH_US(ws) // 1000 + 3600000 + 600000 < wm.wm_ms),
         |r AS (SELECT *,
         |    CAST(ROW_NUMBER() OVER wo AS BIGINT) AS k,
         |    SUM(cents) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS prefix,
         |    CAST(COUNT(*) OVER wp AS BIGINT) AS n,
         |    SUM(cents) OVER wp AS total
         |  FROM vc
         |  WINDOW wo AS (PARTITION BY ws, series ORDER BY tus, event_id),
         |    wp AS (PARTITION BY ws, series)),
         |d AS (SELECT ws, series, n, k, tus,
         |    CAST(n * prefix - k * total AS BIGINT) AS dev FROM r)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, series,
         |  n AS n_points, k AS change_pos, tus AS change_at_us,
         |  dev AS dev_n
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY ws, series
         |    ORDER BY ABS(dev) DESC, k) AS rk FROM d)
         |WHERE rk = 1 ORDER BY w_start, series""".stripMargin,

    "q272_stream_srm" ->
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 3600000000) * 3600000000)
         |      AS ws,
         |    CASE WHEN user_id % 97 = 0 THEN 'junk'
         |      WHEN user_id % 10 < 5 THEN 'control'
         |      ELSE 'treatment' END AS arm, ts
         |  FROM e WHERE user_id IS NOT NULL),
         |g AS (SELECT ws,
         |    CAST(COUNT(*) FILTER (WHERE arm = 'control') AS BIGINT)
         |      AS n0,
         |    CAST(COUNT(*) FILTER (WHERE arm = 'treatment') AS BIGINT)
         |      AS n1,
         |    CAST(COUNT(*) FILTER (WHERE arm NOT IN
         |      ('control', 'treatment')) AS BIGINT) AS n_unexpected
         |  FROM v GROUP BY ws),
         |t AS (SELECT *, n0 + n1 AS n_assigned FROM g),
         |mx2 AS (SELECT MAX(ts) AS m FROM v),
         |dec AS (SELECT t.* FROM t, mx2
         |  WHERE ws + INTERVAL 3600 SECOND <= m - INTERVAL 600 SECOND),
         |arms AS (SELECT ws, 'control' AS arm, n0 AS n, n_assigned,
         |    n_unexpected FROM dec
         |  UNION ALL SELECT ws, 'treatment', n1, n_assigned,
         |    n_unexpected FROM dec)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, arm, n,
         |  500000 AS expected_ppm,
         |  CASE WHEN n_assigned = 0 THEN 0
         |    ELSE (n * 1000000) // n_assigned END AS observed_ppm,
         |  CASE WHEN n_assigned = 0 THEN 0
         |    ELSE (n * 1000000) // n_assigned END - 500000 AS dev_ppm,
         |  CASE WHEN n_assigned = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE ROUND(CAST((n * 2 - n_assigned)
         |        * (n * 2 - n_assigned) AS DOUBLE)
         |      / CAST(2 * n_assigned AS DOUBLE), 6) END AS chi2_term,
         |  n_unexpected
         |FROM arms ORDER BY w_start, arm""".stripMargin,

    "q268_stream_fingerprint" -> {
      // packed row: U+0001 separators (CHR(1)), U+0002 null sentinel;
      // cents stringified as BIGINT so the serialization is portable
      val packed = "COALESCE(CAST(event_id AS VARCHAR), CHR(2)) || CHR(1) || " +
        "COALESCE(CAST(user_id AS VARCHAR), CHR(2)) || CHR(1) || " +
        "COALESCE(event_type, CHR(2)) || CHR(1) || " +
        "COALESCE(CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR), CHR(2))"
      s"""WITH $ctes,
         |h AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws,
         |    ${graft.ops.Sketches.polyHashSql(packed)} AS h, ts
         |  FROM e WHERE ts IS NOT NULL),
         |c AS (SELECT ws, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    CAST(BIT_XOR(h) AS BIGINT) AS xor_h,
         |    CAST(SUM(h) AS BIGINT) AS sum_h
         |  FROM h GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM h),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  n_rows, xor_h, sum_h
         |FROM dec ORDER BY w_start""".stripMargin
    },

    "q246b_stream_cusum_bucket" ->
      // bucket replay: per (hour, series, bucket) counts/cent-sums,
      // densified to all 16 buckets, cumulative prefixes per boundary,
      // argmax |dev| with smallest-boundary tie-break; closed windows
      // only (append mode: ws + window <= max(ts) - delay)
      s"""WITH $ctes,
         |v AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 3600000000) * 3600000000) AS ws,
         |    event_type AS series,
         |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
         |    ((EPOCH_US(ts) % 3600000000) * 16) // 3600000000 AS b,
         |    ts
         |  FROM e WHERE event_type IS NOT NULL AND value IS NOT NULL),
         |mx2 AS (SELECT MAX(ts) AS m FROM v),
         |g AS (SELECT ws, series, b, CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(cents) AS BIGINT) AS sb
         |  FROM v GROUP BY 1, 2, 3),
         |ks AS (SELECT DISTINCT ws, series FROM g),
         |dense AS (SELECT k.ws, k.series, t.b,
         |    COALESCE(g.nb, 0) AS nb, COALESCE(g.sb, 0) AS sb
         |  FROM ks k CROSS JOIN range(0, 16) t(b)
         |  LEFT JOIN g ON g.ws = k.ws AND g.series = k.series AND g.b = t.b),
         |p AS (SELECT ws, series, b,
         |    CAST(SUM(nb) OVER w AS BIGINT) AS kj,
         |    CAST(SUM(sb) OVER w AS BIGINT) AS pj,
         |    CAST(SUM(nb) OVER wp AS BIGINT) AS n,
         |    CAST(SUM(sb) OVER wp AS BIGINT) AS t
         |  FROM dense
         |  WINDOW w AS (PARTITION BY ws, series ORDER BY b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wp AS (PARTITION BY ws, series)),
         |d AS (SELECT ws, series, CAST(b + 1 AS BIGINT) AS j, n,
         |    CAST(n * pj - kj * t AS BIGINT) AS dev FROM p),
         |dec AS (SELECT d.* FROM d, mx2
         |  WHERE ws + INTERVAL 3600 SECOND <= m - INTERVAL 600 SECOND)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, series,
         |  n AS n_points, j AS change_bucket, dev AS dev_n
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY ws, series
         |    ORDER BY ABS(dev) DESC, j) AS rk FROM dec)
         |WHERE rk = 1 ORDER BY w_start, series""".stripMargin,

    "q245b_stream_quantiles_by" -> {
      val nB = 16
      val ests = Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")
        .map { case (q, l) =>
          graft.ops.Sketches.histLadderQuantileExpr(0.0, 200.0, nB, q) +
            s" AS $l"
        }.mkString(", ")
      s"""WITH $ctes,
         |vv AS (SELECT ts, event_type AS series, CAST(value AS DOUBLE) AS v
         |  FROM e WHERE event_type IS NOT NULL AND value IS NOT NULL),
         |vb AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws, series,
         |    ${graft.ops.Sketches.histBucketExpr(0.0, 200.0, nB)} AS b
         |  FROM vv),
         |c AS (SELECT ws, series, ${(0 until nB).map(i =>
                s"COUNT(*) FILTER (WHERE b = $i) AS n$i").mkString(", ")}
         |  FROM vb GROUP BY ws, series),
         |mx2 AS (SELECT MAX(ts) AS m FROM vv),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND),
         |t AS (SELECT *, ${(0 until nB).map(i => s"n$i").mkString(" + ")}
         |    AS n FROM dec)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, series,
         |  n AS n_events, $ests
         |FROM t ORDER BY w_start, series""".stripMargin
    },

    "q245_stream_quantiles" -> {
      val nB = 16
      val ests = Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99")
        .map { case (q, l) =>
          graft.ops.Sketches.histLadderQuantileExpr(0.0, 200.0, nB, q) +
            s" AS $l"
        }.mkString(", ")
      s"""WITH $ctes,
         |vv AS (SELECT ts, CAST(value AS DOUBLE) AS v FROM e
         |  WHERE value IS NOT NULL),
         |vb AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws,
         |    ${graft.ops.Sketches.histBucketExpr(0.0, 200.0, nB)} AS b
         |  FROM vv),
         |c AS (SELECT ws, ${(0 until nB).map(i =>
                s"COUNT(*) FILTER (WHERE b = $i) AS n$i").mkString(", ")}
         |  FROM vb GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM vv),
         |dec AS (SELECT c.* FROM c, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND),
         |t AS (SELECT *, ${(0 until nB).map(i => s"n$i").mkString(" + ")}
         |    AS n FROM dec)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  n AS n_events, $ests
         |FROM t ORDER BY w_start""".stripMargin
    },

    "q317_stream_seasonal" -> {
      // the frozen profile recomputed relationally: per-phase
      // floor-mean of hourly click slot means, global floor-mean
      // fallback for absent phases (matches seasonalProfile), then
      // the 1h-window purchase replay with the positive-mod floor
      s"""WITH $ctes,
         |cv AS (SELECT ts, CAST(ROUND(value * 100) AS BIGINT) AS c
         |  FROM e WHERE event_type = 'click' AND value IS NOT NULL),
         |cs AS (SELECT EPOCH_US(ts) // 1000000 // 3600 AS slot,
         |    COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s
         |  FROM cv GROUP BY 1),
         |cvc AS (SELECT slot,
         |    CAST((s - ((s % n + n) % n)) // n AS BIGINT) AS v_c,
         |    slot % 24 AS ph FROM cs),
         |prof AS (SELECT ph,
         |    CAST((CAST(SUM(v_c) AS BIGINT)
         |      - ((CAST(SUM(v_c) AS BIGINT) % COUNT(*) + COUNT(*))
         |        % COUNT(*))) // COUNT(*) AS BIGINT) AS base
         |  FROM cvc GROUP BY ph),
         |gb AS (SELECT CAST((CAST(SUM(v_c) AS BIGINT)
         |      - ((CAST(SUM(v_c) AS BIGINT) % COUNT(*) + COUNT(*))
         |        % COUNT(*))) // COUNT(*) AS BIGINT) AS gbase
         |  FROM cvc),
         |pv AS (SELECT ts, CAST(ROUND(value * 100) AS BIGINT) AS c
         |  FROM e WHERE event_type = 'purchase' AND value IS NOT NULL),
         |pw AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 3600)
         |      * 3600 * 1000000) AS ws,
         |    COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s
         |  FROM pv GROUP BY 1),
         |pr AS (SELECT ws, n,
         |    CAST((s - ((s % n + n) % n)) // n AS BIGINT) AS v_c,
         |    (EPOCH_US(ws) // 1000000 // 3600) % 24 AS ph FROM pw),
         |mx2 AS (SELECT MAX(ts) AS m FROM pv),
         |dec AS (SELECT pr.* FROM pr, mx2
         |  WHERE ws + INTERVAL 3600 SECOND <= m - INTERVAL 600 SECOND),
         |j AS (SELECT d.ws, d.n, d.v_c,
         |    COALESCE(prof.base, gb.gbase) AS base_c
         |  FROM dec d CROSS JOIN gb LEFT JOIN prof ON d.ph = prof.ph)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  CAST(n AS BIGINT) AS n_events, v_c, base_c,
         |  v_c - base_c AS resid_c,
         |  (ABS(v_c - base_c) > 800) AS anomaly
         |FROM j ORDER BY w_start""".stripMargin
    },

    "q315_stream_auc" -> {
      val bExpr = graft.ops.Sketches.histBucketExpr(0.0, 1.0, 16)
      s"""WITH $ctes,
         |vv AS (SELECT ts,
         |    LEAST(GREATEST(value / 200.0, 0.0), 1.0) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM e WHERE value IS NOT NULL AND event_type IS NOT NULL),
         |vb AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 * 1000000) AS ws,
         |    $bExpr AS b, y
         |  FROM vv),
         |c AS (SELECT ws, b,
         |    SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
         |    SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS nn
         |  FROM vb GROUP BY ws, b),
         |k AS (SELECT ws, b, np, nn,
         |    COALESCE(SUM(nn) OVER (PARTITION BY ws ORDER BY b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cb
         |  FROM c),
         |a AS (SELECT ws, CAST(SUM(np) AS BIGINT) AS n_pos,
         |    CAST(SUM(nn) AS BIGINT) AS n_neg,
         |    CAST(SUM(np * (2 * cb + nn)) AS BIGINT) AS u2
         |  FROM k GROUP BY ws),
         |mx2 AS (SELECT MAX(ts) AS m FROM vv),
         |dec AS (SELECT a.* FROM a, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, n_pos,
         |  n_neg,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |    ELSE CAST((CAST(u2 AS HUGEINT) * 1000000)
         |      // (2 * n_pos * n_neg) AS BIGINT) END AS auc_micro
         |FROM dec ORDER BY w_start""".stripMargin
    },

    "q294_stream_quantile_map" -> {
      val nB = 16
      val bExpr = graft.ops.Sketches.histBucketExpr(0.0, 200.0, nB)
      // the Spark side inverts the frozen ladder as a literal CASE
      // chain; the oracle inverts RELATIONALLY (min reference bucket
      // meeting the cross-multiplied target over PRESENT buckets) —
      // identical integers by the constant-cume-across-empty-runs
      // argument in quantileMapHist's scaladoc
      s"""WITH $ctes,
         |rv AS (SELECT CAST(value AS DOUBLE) AS v FROM e
         |  WHERE event_type = 'click' AND value IS NOT NULL),
         |rh AS (SELECT $bExpr AS b, COUNT(*) AS cnt FROM rv GROUP BY 1),
         |rc AS (SELECT a.b, SUM(x.cnt) AS cume FROM rh a
         |  JOIN rh x ON x.b <= a.b GROUP BY a.b),
         |nr AS (SELECT MAX(cume) AS n_ref FROM rc),
         |vv AS (SELECT ts, CAST(value AS DOUBLE) AS v FROM e
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |vb AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300)
         |      * 300 * 1000000) AS ws,
         |    $bExpr AS b
         |  FROM vv),
         |c AS (SELECT ws, b, COUNT(*) AS n_b FROM vb GROUP BY ws, b),
         |t AS (SELECT ws, b, n_b,
         |    SUM(n_b) OVER (PARTITION BY ws ORDER BY b) AS cume,
         |    SUM(n_b) OVER (PARTITION BY ws) AS n FROM c),
         |mx2 AS (SELECT MAX(ts) AS m FROM vv),
         |dec AS (SELECT t.* FROM t, mx2
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND),
         |mp AS (SELECT d.ws, d.b, d.n_b, d.cume, d.n,
         |    MIN(rc.b) AS mapped_bucket
         |  FROM dec d CROSS JOIN nr
         |  JOIN rc ON rc.cume * d.n >= d.cume * nr.n_ref
         |  GROUP BY d.ws, d.b, d.n_b, d.cume, d.n)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  CAST(n AS BIGINT) AS n_events, CAST(b AS INTEGER) AS bucket,
         |  CAST(n_b AS BIGINT) AS n_b, CAST(cume AS BIGINT) AS cume,
         |  CAST(mapped_bucket AS INTEGER) AS mapped_bucket,
         |  ${graft.ops.Validate.histMidExpr(0.0, 200.0, nB)} AS mapped
         |FROM mp ORDER BY w_start, bucket""".stripMargin
    },

    "q214_stream_psi_drift" -> {
      val bounds = Seq(10.0, 20.0, 40.0, 80.0, 160.0)
      val labels = bounds.map(b => s"le_$b") :+ "overflow"
      val nB = labels.length
      def flt(i: Int) =
        s"COUNT(*) FILTER (WHERE b = '${labels(i)}') AS n$i"
      val terms = labels.indices.map(i =>
        graft.ops.Validate.psiTermExprOf(s"n$i", "t_cur", s"r$i", "t_ref"))
        .mkString(" + ")
      s"""WITH $ctes,
         |rv AS (SELECT CAST(value AS DOUBLE) AS v FROM e
         |  WHERE event_type = 'click' AND value IS NOT NULL),
         |rb AS (SELECT ${graft.ops.Validate.psiBucketExpr(bounds)} AS b FROM rv),
         |rc AS (SELECT ${labels.indices.map(i =>
                  s"COUNT(*) FILTER (WHERE b = '${labels(i)}') + 1 AS r$i")
                  .mkString(", ")} FROM rb),
         |rt AS (SELECT *, ${labels.indices.map(i => s"r$i").mkString(" + ")}
         |    AS t_ref FROM rc),
         |pv AS (SELECT ts, CAST(value AS DOUBLE) AS v FROM e
         |  WHERE event_type = 'purchase' AND value IS NOT NULL),
         |pb AS (SELECT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000)
         |      AS ws,
         |    ${graft.ops.Validate.psiBucketExpr(bounds)} AS b FROM pv),
         |c AS (SELECT ws, ${labels.indices.map(flt).mkString(", ")}
         |  FROM pb GROUP BY ws),
         |mxp AS (SELECT MAX(ts) AS m FROM pv),
         |dec AS (SELECT c.* FROM c, mxp
         |  WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND),
         |t AS (SELECT *, ${labels.indices.map(i => s"(n$i + 1)").mkString(" + ")}
         |    AS t_cur FROM dec)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  t_cur - $nB AS n_events, t_cur,
         |  $terms AS psi_nano
         |FROM t CROSS JOIN rt ORDER BY w_start""".stripMargin
    },

    "q197_stream_distinct_users" ->
      s"""WITH $ctes,
         |w AS (SELECT DISTINCT
         |    make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000) AS ws,
         |    user_id FROM e)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
         |  COUNT(*) AS n_users
         |FROM w, mx
         |WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND
         |GROUP BY ws ORDER BY w_start""".stripMargin,

    "q118_stream_static_join" ->
      s"""WITH $ctes,
         |w AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000) AS ws,
         |             CAST(user_id % 5 AS INTEGER) AS tier, value FROM e)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, tier,
         |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
         |FROM w, mx
         |WHERE ws + INTERVAL 300 SECOND <= m - INTERVAL 600 SECOND
         |GROUP BY ws, tier ORDER BY w_start, tier""".stripMargin,

    "q111_stream_sliding" ->
      s"""WITH $ctes,
         |b AS (SELECT make_timestamp((EPOCH_US(ts) // 1000000 // 300) * 300 * 1000000) AS bkt,
         |             event_type FROM e),
         |w AS (SELECT bkt AS ws, event_type FROM b
         |      UNION ALL
         |      SELECT bkt - INTERVAL 300 SECOND AS ws, event_type FROM b)
         |SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type, COUNT(*) AS n
         |FROM w, mx
         |WHERE ws + INTERVAL 600 SECOND <= m - INTERVAL 600 SECOND
         |GROUP BY ws, event_type ORDER BY w_start, event_type""".stripMargin,

    "q112_stream_session" ->
      s"""WITH $ctes,
         |o AS (SELECT user_id, ts, value,
         |        CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |               OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 300 SECOND
         |             THEN 1 ELSE 0 END AS brk
         |      FROM e),
         |g AS (SELECT user_id, ts, value,
         |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM o),
         |sess AS (SELECT user_id,
         |           MIN(ts) AS s_start_t, MAX(ts) + INTERVAL 300 SECOND AS s_end_t,
         |           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_val
         |         FROM g GROUP BY user_id, sid)
         |SELECT user_id, STRFTIME(s_start_t, '%Y-%m-%d %H:%M:%S') AS s_start,
         |  STRFTIME(s_end_t, '%Y-%m-%d %H:%M:%S') AS s_end, n, sum_val
         |FROM sess, mx
         |WHERE s_end_t <= m - INTERVAL 600 SECOND
         |ORDER BY user_id, s_start""".stripMargin,

    "q113_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q119_stream_outer_join" ->
      s"""WITH $ctes,
         |v AS (SELECT user_id, ts AS v_ts, event_id AS view_id FROM e
         |  WHERE event_type = 'view'),
         |c AS (SELECT user_id AS c_user, ts AS c_ts, event_id AS click_id
         |  FROM e WHERE event_type = 'click')
         |SELECT v.user_id, v.view_id, c.click_id
         |FROM v CROSS JOIN mx LEFT JOIN c ON v.user_id = c.c_user
         |  AND c.c_ts >= v.v_ts AND c.c_ts <= v.v_ts + INTERVAL 3600 SECOND
         |WHERE v.v_ts < mx.m - INTERVAL 75 MINUTE
         |ORDER BY user_id, view_id, click_id""".stripMargin,

    "q115_stream_stream_join" ->
      s"""WITH $ctes
         |SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
         |  CAST(EPOCH_US(c.ts - v.ts) AS BIGINT) AS gap_us
         |FROM e v JOIN e c ON v.user_id = c.user_id
         |  AND v.event_type = 'view' AND c.event_type = 'click'
         |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 3600 SECOND
         |ORDER BY v.user_id, view_id, click_id""".stripMargin,

    // final state per user: n = total events (the running count's last
    // emission), max_value = running max rounded exactly like the Scala
    // side's math.round(x*100)/100 = floor(x*100 + 0.5)/100
    "q114_stream_stateful" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  FLOOR(MAX(value) * 100 + 0.5) / 100.0 AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
