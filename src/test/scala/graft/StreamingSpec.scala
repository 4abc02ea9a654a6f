package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** M5 streaming specs (SURVEY §2.11): batch-vs-stream equivalence on
  * replayed events, plus the state-bounded dedup variant that has no SQL
  * oracle (single-batch replay keeps it deterministic here).
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window equals batch query on emitted windows") {
    val streamed = Streams.runToBatch(
      spark, Streams.tumblingAgg(Streams.eventsStream(spark, sfTiny)), "spec_tumbling")

    val ev = Tables.events(spark, sfTiny)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = ev
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_val"))
      .filter(col("window.end") <= lit(maxTs) - expr("INTERVAL 10 MINUTE"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("n"), col("sum_val"))

    val s = streamed.orderBy("w_start").collect().map(_.toSeq).toSeq
    val b = batch.orderBy("w_start").collect().map(_.toSeq).toSeq
    assert(s.nonEmpty && s == b)
  }

  test("session windows merge events within the gap and emit finalized sessions") {
    val sessions = Streams.runToBatch(
      spark, Streams.sessionAgg(Streams.eventsStream(spark, sfTiny)), "spec_session")
    val rows = sessions.collect()
    assert(rows.nonEmpty)
    // every session spans at least the gap (end = last event + 5 min)
    val spans = sessions
      .select(unix_timestamp(to_timestamp(col("s_end"))) -
        unix_timestamp(to_timestamp(col("s_start")))).collect().map(_.getLong(0))
    assert(spans.forall(_ >= 300))
  }

  test("dropDuplicatesWithinWatermark dedups within the delay on one batch") {
    val stream = Streams.dedupKeys(Streams.eventsStream(spark, sfTiny))
    val deduped = Streams.runToBatch(spark, stream, "spec_ddww")
    val n = deduped.count()
    val exact = Tables.events(spark, sfTiny)
      .select("user_id", "event_type").distinct().count()
    // single-batch replay: state never expires mid-batch → exact distinct
    assert(n == exact)
  }

  test("streaming dedup (unbounded state) yields the exact distinct key set") {
    val q = graft.queries.StreamingQueries.queries("q113_stream_dedup")
    val res = q(spark, sfTiny)
    val exact = Tables.events(spark, sfTiny)
      .select("user_id", "event_type").distinct().count()
    assert(res.count() == exact)
  }

  test("map-only corpus ops compose with readStream: keyword tagging batch == stream") {
    import graft.streaming.Streams
    val kws = Seq("spark", "merge", "a a")
    val stream = graft.ops.Keywords.tagKeywords(
      Streams.documentsStream(spark, sfTiny), "doc_id", "text", kws)
    val streamed = Streams.runToBatch(spark, stream, "kw_stream")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val batch = graft.ops.Keywords.tagKeywords(
        Tables.documents(spark, sfTiny), "doc_id", "text", kws)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming SCD2 emits exactly the batch op's closed intervals") {
    val streamed = Streams.runToBatch(spark,
        Streams.scd2Stream(Streams.eventsStream(spark, sfTiny)), "spec_scd2")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    val batch = graft.ops.FrameOps.scd2Intervals(
        Tables.events(spark, sfTiny),
        "user_id", Seq("ts", "event_id"), Seq("event_type"))
      .filter(col("valid_to").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("psiDriftStream runs off a FROZEN literal reference (no batch rescan)") {
    // production monitor shape: the reference count vector is a pinned
    // literal — no reference-corpus scan anywhere in the streaming
    // query. Agreement contract: the same literal fed to the batch
    // psiTermExpr arithmetic must reproduce the stream's psi_nano.
    val bounds = Seq(10.0, 20.0, 40.0, 80.0, 160.0)
    val frozen = Seq(100L, 200L, 300L, 250L, 100L, 50L) // pinned at freeze time
    val stream = Streams.eventsStream(spark, sfTiny)
      .filter(col("event_type") === "purchase")
    val out = Streams.runToBatch(spark,
      Streams.psiDriftStream(stream, frozen, bounds), "spec_psi_frozen")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // psi is finite and non-negative on every emitted window
    assert(out.filter(col("psi_nano") < 0).count() == 0)
    // psiReferenceCounts is the compute-once producer of that literal:
    // bucket order and ladder match the stream side label-for-label
    val ref = graft.ops.Validate.psiReferenceCounts(
      Tables.events(spark, sfTiny).filter(col("event_type") === "click"),
      "value", bounds)
    assert(ref.length == bounds.length + 1 && ref.sum > 0)
    // and an empty reference slice yields an all-zero vector (the
    // +1-smoothing in psiDriftStream keeps PSI defined even then)
    val empty = graft.ops.Validate.psiReferenceCounts(
      Tables.events(spark, sfTiny).filter(lit(false)), "value", bounds)
    assert(empty == Seq.fill(bounds.length + 1)(0L))
  }

  test("streaming KMV distinct equals the batch sketch window-for-window") {
    // the streaming state IS Sketches.kmvSketch's contract, so the
    // final per-window emission must equal the batch grouped sketch
    // exactly — same hashes, same estimator, no tolerance
    val k = 16
    val streamed = Streams.runToBatch(spark,
        Streams.kmvDistinctStream(Streams.eventsStream(spark, sfTiny), k),
        "spec_kmv_stream", outputMode = "update")
      .groupBy(col("w_start"))
      .agg(max(struct(col("n_events"), col("n_sketch"),
        col("est_distinct"))).as("f"))
      .select(col("w_start"), col("f.n_events"), col("f.n_sketch"),
        col("f.est_distinct"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sfTiny)
      .select(date_format(window(col("ts"), "5 minutes").getField("start"),
        "yyyy-MM-dd HH:mm:ss").as("grp"),
        col("user_id").cast("string").as("key"))
    val batch = graft.ops.Sketches.kmvDistinctBy(
        graft.ops.Sketches.kmvSketchBy(ev, "grp", col("key"), k), k)
      .join(ev.groupBy(col("grp")).agg(count(lit(1)).as("n_events")), Seq("grp"))
      .collect().map(r => (r.getString(0),
        (r.getLong(3), r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming KMV overlap equals batch kmvOverlap per window; frozen ref only") {
    import spark.implicits._
    val k = 16
    val clicks = Tables.events(spark, sfTiny)
      .filter(col("event_type") === "click")
    val ref = graft.ops.Sketches.kmvSketchValues(
      clicks, col("user_id").cast("string"), k)
    assert(ref.nonEmpty && ref == ref.sorted)
    val streamed = Streams.runToBatch(spark,
        Streams.kmvOverlapStream(
          Streams.eventsStream(spark, sfTiny)
            .filter(col("event_type") === "purchase"), ref, k),
        "spec_kmv_ov", outputMode = "update")
      .groupBy(col("w_start"))
      .agg(max(struct(col("n_events"), col("n_sketch"), col("jaccard_bp"),
        col("est_union"), col("est_intersect"))).as("f"))
      .select(col("w_start"), col("f.jaccard_bp"), col("f.est_union"),
        col("f.est_intersect"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.nonEmpty)
    // batch twin per window: kmvOverlap(window sketch, ref sketch)
    val refDf = ref.zipWithIndex
      .map { case (h, i) => (i + 1, h) }.toDF("rk", "h")
    val purchases = Tables.events(spark, sfTiny)
      .filter(col("event_type") === "purchase")
      .select(date_format(window(col("ts"), "5 minutes").getField("start"),
        "yyyy-MM-dd HH:mm:ss").as("grp"),
        col("user_id").cast("string").as("key"))
    streamed.foreach { case (w, got) =>
      val cur = graft.ops.Sketches.kmvSketch(
        purchases.filter(col("grp") === w).toDF(), col("key"), k)
      val b = graft.ops.Sketches.kmvOverlap(cur, refDf, k).collect().head
      assert((b.getLong(1), b.getLong(2), b.getLong(3)) == got,
        s"window $w: batch ${(b.getLong(1), b.getLong(2), b.getLong(3))} vs stream $got")
    }
    // guards: misordered / oversized reference
    intercept[IllegalArgumentException] {
      Streams.kmvOverlapStream(Streams.eventsStream(spark, sfTiny),
        Seq(5L, 3L), k)
    }
  }

  test("streaming near-dup monitor equals the batch band computation window-for-window") {
    import graft.ops.Dedup
    // frozen reference: bands of the 1-in-101 blessed sample
    val docs = Tables.documents(spark, sfTiny)
    val ref = Dedup.bandKeyValues(
      docs.filter(col("doc_id") % 101 === 0), "doc_id", "text")
    assert(ref.nonEmpty)
    val streamed = Streams.runToBatch(spark,
        Streams.nearDupBandStream(Streams.documentsStream(spark, sfTiny), ref),
        "spec_near_dup", outputMode = "update")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3), r.getInt(4))).toMap
    assert(streamed.nonEmpty)
    // batch twin: same band arithmetic, windows from the synthetic
    // clock, "earlier" = smaller doc_id in the same window
    import spark.implicits._
    val bands = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        (((col("doc_id") + 1000000L) / 1000).cast("long") * 1000).as("ws"),
        posexplode(Dedup.bandKeyArray(
          graft.expressions.TextHashes.minhash_sig(
            Dedup.normText(col("text")), 5, 16), 16, 4))
          .as(Seq("band", "bkey")))
      .persist()
    val dup = bands.as("a").join(bands.as("b"),
        col("a.ws") === col("b.ws") && col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("b.doc_id") < col("a.doc_id"))
      .groupBy(col("a.ws").as("ws"), col("a.doc_id").as("doc_id"),
        col("a.band").as("band"))
      .agg(min(col("b.doc_id")).as("peer_band"))
      .groupBy(col("ws"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_dup_bands"),
        min(col("peer_band")).as("peer"))
    val refDf = ref.toDF("band", "bkey")
    val refAgg = bands.join(refDf, Seq("band", "bkey"))
      .groupBy(col("doc_id")).agg(count(lit(1)).cast("int").as("n_ref_bands"))
    val batch = bands.select(col("ws"), col("doc_id")).distinct()
      .join(dup, Seq("ws", "doc_id"), "left")
      .join(refAgg, Seq("doc_id"), "left")
      .select(col("ws"), col("doc_id"),
        coalesce(col("n_dup_bands"), lit(0)).as("n_dup_bands"),
        coalesce(col("peer"), lit(-1L)).as("peer"),
        coalesce(col("n_ref_bands"), lit(0)).as("n_ref_bands"))
      .filter(col("n_dup_bands") > 0 || col("n_ref_bands") > 0)
      .select(date_format(timestamp_seconds(col("ws")),
        "yyyy-MM-dd HH:mm:ss").as("w_start"), col("doc_id"),
        col("n_dup_bands"), col("peer"), col("n_ref_bands"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3), r.getInt(4))).toMap
    bands.unpersist(blocking = false)
    assert(streamed == batch)
    // band-index guard on the frozen reference
    intercept[IllegalArgumentException] {
      Streams.nearDupBandStream(Streams.documentsStream(spark, sfTiny),
        Seq((7, "x-y-z-w")))
    }
  }

  test("streaming funnel's drained state equals the batch funnelSteps row-for-row") {
    val streamed = Streams.runToBatch(spark,
        Streams.funnelStream(Streams.eventsStream(spark, sfTiny),
          Seq("view", "click", "purchase")),
        "spec_funnel", outputMode = "update")
      .groupBy(col("user_id"))
      .agg(max(struct(col("rev"), col("depth"), col("t_first"),
        col("t_last"), col("span_sec"))).as("f"))
      .select(col("user_id"), col("f.depth"), col("f.t_first"),
        col("f.t_last"), col("f.span_sec"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val batch = graft.ops.ScaleJoins.funnelSteps(
        Tables.events(spark, sfTiny), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("topKStream equals the batch window top-k; state cap fails fast") {
    val streamed = Streams.runToBatch(spark,
        Streams.topKStream(Streams.eventsStream(spark, sfTiny), k = 5),
        "spec_topk", outputMode = "update")
      .groupBy(col("w_start"))
      .agg(max(struct(col("n_events"), col("n_keys"), col("top_k")))
        .as("f"))
      .select(col("w_start"), col("f.n_events"), col("f.n_keys"),
        col("f.top_k"))
      .orderBy("w_start").collect().map(_.toSeq).toSeq
    // batch replay: per-(window, user) counts → rank → same string
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ws")).orderBy(col("cnt").desc, col("user_id"))
    val c = Tables.events(spark, sfTiny)
      .filter(col("user_id").isNotNull)
      .select(date_format(window(col("ts"), "300 seconds")
        .getField("start"), "yyyy-MM-dd HH:mm:ss").as("ws"), col("user_id"))
      .groupBy(col("ws"), col("user_id")).agg(count(lit(1)).as("cnt"))
    val batch = c.withColumn("rk", row_number().over(w))
      .groupBy(col("ws"))
      .agg(sum(col("cnt")).as("n_events"), count(lit(1)).as("n_keys"),
        expr("concat_ws(',', transform(array_sort(collect_list(" +
          "CASE WHEN rk <= 5 THEN named_struct('rk', rk, 's', " +
          "concat(user_id, ':', cnt)) END)), x -> x.s))").as("top_k"))
      .orderBy("ws").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // cap: 2 distinct keys with maxStateKeys = 1 must fail loudly
    val ex = intercept[Exception] {
      Streams.runToBatch(spark,
        Streams.topKStream(Streams.eventsStream(spark, sfTiny), k = 5,
          maxStateKeys = 1),
        "spec_topk_cap", outputMode = "update").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("distinct")), ex.getMessage)
  }

  /** Stage rows as N single-file micro-batches: each group becomes one
    * parquet file in a watched dir with strictly increasing modTimes,
    * replayed via maxFilesPerTrigger=1 — the out-of-order multi-batch
    * harness the single-fixture replay can't express.
    */
  private def stageBatches(name: String,
      batches: Seq[org.apache.spark.sql.DataFrame]): String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(s"graft-mb-$name-")
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory(s"graft-mb-$name-w$i-")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator()
      val src = {
        var found: java.nio.file.Path = null
        while (part.hasNext) {
          val p = part.next()
          if (p.toString.endsWith(".parquet")) found = p
        }
        found
      }
      val dst = dir.resolve(f"b$i%03d.parquet")
      Files.copy(src, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    dir.toString
  }

  private def eventsDF(rows: Seq[(Long, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "value", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
  }

  private def streamDir(dir: String,
      schema: org.apache.spark.sql.types.StructType) =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

  test("funnelStream absorbs a late-but-within-watermark earlier-step event from a later micro-batch") {
    // batch 1 delivers user 1's click@10:10 FIRST; the view@10:05
    // arrives in batch 2 (late, but above the 10:00 watermark). The
    // eager per-batch greedy fold would discard the click forever and
    // report depth 1 — the buffered fold must report depth 2, equal to
    // the batch op over the union.
    val b1 = eventsDF(Seq(
      (1L, 1L, "click", 0.0, "2024-01-01 10:10:00"),
      (2L, 2L, "view", 0.0, "2024-01-01 10:00:00"),
      (3L, 2L, "click", 0.0, "2024-01-01 10:12:00")))
    val b2 = eventsDF(Seq(
      (4L, 1L, "view", 0.0, "2024-01-01 10:05:00"),
      (5L, 2L, "purchase", 0.0, "2024-01-01 10:15:00")))
    val dir = stageBatches("funnel", Seq(b1, b2))
    val streamed = Streams.runToBatch(spark,
        Streams.funnelStream(streamDir(dir, b1.schema),
          Seq("view", "click", "purchase")),
        "spec_funnel_mb", outputMode = "update")
      .groupBy(col("user_id"))
      .agg(max(struct(col("rev"), col("depth"), col("t_first"),
        col("t_last"), col("span_sec"))).as("f"))
      .select(col("user_id"), col("f.depth"), col("f.t_first"),
        col("f.t_last"), col("f.span_sec"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val batch = graft.ops.ScaleJoins.funnelSteps(
        b1.union(b2), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.head(1) == 2) // user 1 recovered the out-of-order chain
  }

  test("funnelStream idleTimeout evicts an idle user, emitting the final fold") {
    // user 9 goes idle after batch 1; batch 2's events push the
    // watermark far past lastSeen + 1 minute, so the no-data timeout
    // sweep must emit user 9's final fold (depth 1) from the eviction
    // branch and remove the state
    val b1 = eventsDF(Seq(
      (1L, 9L, "view", 0.0, "2024-01-01 10:00:00")))
    val b2 = eventsDF(Seq(
      (2L, 8L, "view", 0.0, "2024-01-01 11:30:00")))
    val dir = stageBatches("funnelidle", Seq(b1, b2))
    val rows = Streams.runToBatch(spark,
        Streams.funnelStream(streamDir(dir, b1.schema),
          Seq("view", "click"), idleTimeout = Some("1 minute")),
        "spec_funnel_idle", outputMode = "update")
      .groupBy(col("user_id"))
      .agg(max(struct(col("rev"), col("depth"))).as("f"))
      .select(col("user_id"), col("f.depth"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.contains((9L, 1)), rows.mkString(","))
  }

  test("scd2Stream idleTimeout surfaces the open interval with valid_to NULL on eviction") {
    val b1 = eventsDF(Seq(
      (1L, 9L, "view", 0.0, "2024-01-01 10:00:00"),
      (2L, 9L, "click", 0.0, "2024-01-01 10:01:00")))
    val b2 = eventsDF(Seq(
      (3L, 8L, "view", 0.0, "2024-01-01 11:30:00")))
    val dir = stageBatches("scd2idle", Seq(b1, b2))
    val rows = Streams.runToBatch(spark,
        Streams.scd2Stream(streamDir(dir, b1.schema),
          idleTimeout = Some("1 minute")),
        "spec_scd2_idle")
      .filter(col("user_id") === 9L)
      .orderBy(col("valid_from"))
      .collect().map(r => (r.getString(1), r.isNullAt(3)))
    // closed interval (view, non-null close) + evicted open interval
    // (click, NULL close = the current-row marker)
    assert(rows.toSeq == Seq(("view", false), ("click", true)),
      rows.mkString(","))
  }

  test("scd2Stream idle clock tracks TRUE last activity: an older in-watermark batch must not pull eviction earlier") {
    // key 9's last activity is 10:00; batch 2 delivers an OLDER (but
    // in-watermark) 9:55 change. A timeout re-armed from only the
    // batch max (9:55 + 30 min = 10:25) would evict key 9 during the
    // batch-3 sweep (watermark 10:29) and NULL-close the open view
    // interval; the true-last-activity clock (10:00 + 30 min = 10:30)
    // keeps it alive, so batch 4's click closes it properly at 10:50.
    val b1 = eventsDF(Seq(
      (1L, 9L, "view", 0.0, "2024-01-01 10:00:00")))
    val b2 = eventsDF(Seq(
      (2L, 9L, "view", 0.0, "2024-01-01 09:55:00"),
      (3L, 8L, "view", 0.0, "2024-01-01 10:39:00")))
    val b3 = eventsDF(Seq(
      (4L, 8L, "view", 0.0, "2024-01-01 10:45:00")))
    val b4 = eventsDF(Seq(
      (5L, 9L, "click", 0.0, "2024-01-01 10:50:00")))
    val dir = stageBatches("scd2clock", Seq(b1, b2, b3, b4))
    val rows = Streams.runToBatch(spark,
        Streams.scd2Stream(streamDir(dir, b1.schema),
          idleTimeout = Some("30 minutes")),
        "spec_scd2_clock")
      .filter(col("user_id") === 9L)
      .orderBy(col("valid_from"))
      .collect().map(r => (r.getString(1), if (r.isNullAt(3)) "null"
        else r.getTimestamp(3).toString))
    // exactly one emitted row for key 9: the view interval closed by
    // the 10:50 click (an early eviction would read ("view", "null"))
    assert(rows.toSeq == Seq(("view", "2024-01-01 10:50:00.0")),
      rows.mkString(","))
  }

  test("heavyHittersStream: MG candidates are a superset of true heavy hitters at the cap boundary; recount equals batch") {
    // 40 events in one window: user 1 x 20, user 2 x 8, users 3..14 x 1
    // each. k = 3 forces constant decrement churn; freq(1) = 20 > 40/3
    // must survive in ANY arrival order (pigeonhole), smaller keys may
    // or may not ride along
    val rows = (1 to 20).map(i => (i.toLong, 1L, "view", 0.0,
        f"2024-01-01 10:00:${i % 60}%02d")) ++
      (21 to 28).map(i => (i.toLong, 2L, "view", 0.0,
        f"2024-01-01 10:01:${i % 60}%02d")) ++
      (29 to 40).map(i => (i.toLong, (i - 26).toLong, "view", 0.0,
        f"2024-01-01 10:02:${i % 60}%02d"))
    val df = eventsDF(scala.util.Random.shuffle(rows))
    val dir = stageBatches("hhmg", Seq(df))
    val emitted = Streams.runToBatch(spark,
        Streams.heavyHittersStream(streamDir(dir, df.schema), k = 3),
        "spec_hh_mg", outputMode = "update")
      .orderBy(col("n_events").desc).collect()
    assert(emitted.nonEmpty)
    val cands = emitted.head.getSeq[Long](2)
    assert(cands.size <= 3 && cands.contains(1L), cands.mkString(","))
    // full recount pattern on the real fixture == plain GROUP BY/HAVING
    val k = 20
    val streamedHH = graft.queries.StreamingQueries
      .queries("q243_stream_heavy_hitters")(spark, sfTiny)
      .collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sfTiny).filter(col("user_id").isNotNull)
      .select(date_format(window(col("ts"), "300 seconds")
        .getField("start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("user_id"))
      .groupBy(col("w_start"), col("user_id")).agg(count(lit(1)).as("cnt"))
    val tot = ev.groupBy(col("w_start")).agg(sum(col("cnt")).as("n_total"))
    val batchHH = ev.join(tot, Seq("w_start"))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("w_start"), col("user_id"), col("cnt"), col("n_total"))
      .orderBy(col("w_start"), col("user_id"))
      .collect().map(_.toSeq).toSeq
    assert(streamedHH == batchHH && streamedHH.nonEmpty)
  }

  test("cusumStream finds the hand-computed mean-shift vertex; out-of-order arrival is absorbed") {
    def fold(res: org.apache.spark.sql.DataFrame) = res
      .groupBy(col("w_start"), col("series"))
      .agg(max(struct(col("n_points"), col("change_pos"),
        col("change_at_us"), col("dev_n"))).as("f"))
      .select(col("w_start"), col("series"), col("f.n_points"),
        col("f.change_pos"), col("f.dev_n"))
      .orderBy("w_start", "series").collect().map(_.toSeq).toSeq
    // series: 6 events at value 1.00, then 4 at 11.00 — the CUSUM
    // vertex is position 6 (the last low point): total = 5000 cents,
    // dev_6 = 10*600 - 6*5000 = -24000, the magnitude max
    val rows = (1 to 6).map(i => (i.toLong, 1L, "view", 1.0,
        f"2024-01-01 10:0$i:00")) ++
      (7 to 9).map(i => (i.toLong, 1L, "view", 11.0,
        f"2024-01-01 10:0$i:00")) ++
      Seq((10L, 1L, "view", 11.0, "2024-01-01 10:10:00"))
    val all = eventsDF(rows)
    val one = fold(Streams.runToBatch(spark,
      Streams.cusumStream(streamDir(stageBatches("cusum1", Seq(all)),
        all.schema)), "spec_cusum1", outputMode = "update"))
    assert(one == Seq(Seq("2024-01-01 10:00:00", "view", 10L, 6L, -24000L)),
      one.toString)
    // out-of-order: the late low event (pos 5) arrives in batch 2,
    // within the watermark — the buffered re-fold must land on the
    // same vertex as the single-batch drain
    val b1 = eventsDF(rows.filterNot(_._1 == 5L))
    val b2 = eventsDF(rows.filter(_._1 == 5L))
    val two = fold(Streams.runToBatch(spark,
      Streams.cusumStream(streamDir(stageBatches("cusum2", Seq(b1, b2)),
        b1.schema)), "spec_cusum2", outputMode = "update"))
    assert(two == one, s"two=$two one=$one")
  }

  test("quantileStream equals the batch histogram-quantile tier window-for-window") {
    val (lo, hi, nB) = (0.0, 200.0, 16)
    val qs = Seq(0.5, 0.95, 0.99)
    val streamed = Streams.runToBatch(spark,
        Streams.quantileStream(Streams.eventsStream(spark, sfTiny),
          lo, hi, nB, qs), "spec_quant")
      .orderBy("w_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(streamed.nonEmpty)
    // batch replication through the OTHER spelling of the same
    // arithmetic: per-window histBuildBy rows + histQuantileBy's
    // row-ladder walk — cross-validates histLadderQuantileExpr against
    // histEstExpr on real data
    val ev = Tables.events(spark, sfTiny)
      .filter(col("value").isNotNull)
      .select(date_format(window(col("ts"), "5 minutes")
        .getField("start"), "yyyy-MM-dd HH:mm:ss").as("grp"),
        col("value"))
    val hist = graft.ops.Sketches.histBuildBy(ev, "grp", "value", lo, hi, nB)
    val batchMap = graft.ops.Sketches.histQuantileBy(hist, lo, hi, nB, qs)
      .select(col("grp"), col("q"), col("n"), col("est"))
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    streamed.foreach { case (w, n, p50, p95, p99) =>
      qs.zip(Seq(p50, p95, p99)).foreach { case (q, est) =>
        assert(batchMap((w, q)) == ((n, est)),
          s"window $w q$q: streamed ($n, $est) vs ${batchMap((w, q))}")
      }
    }
  }

  test("cusumBucketStream pins the hand-computed boundary vertex with first-boundary tie-break") {
    // one hour window 10:00-11:00, 16 buckets of 225s. Events: two
    // cents=100 in bucket 0, two cents=500 in bucket 8 (10:30/10:31).
    // n=4, total=1200; boundaries 1..8 all have (k=2, p=200) ->
    // dev = 4*200 - 2*1200 = -1600; boundaries 9..16 have dev = 0.
    // argmax |dev| ties across j=1..8 -> smallest boundary j=1.
    val b1 = eventsDF(Seq(
      (1L, 1L, "view", 1.0, "2024-01-01 10:00:00"),
      (2L, 2L, "view", 1.0, "2024-01-01 10:01:00"),
      (3L, 3L, "view", 5.0, "2024-01-01 10:30:00"),
      (4L, 4L, "view", 5.0, "2024-01-01 10:31:00")))
    val b2 = eventsDF(Seq(
      (9L, 9L, "click", 0.0, "2024-01-01 11:30:00"))) // closes 10:00
    val dir = stageBatches("cusumb", Seq(b1, b2))
    val rows = Streams.runToBatch(spark,
        Streams.cusumBucketStream(streamDir(dir, b1.schema)),
        "spec_cusum_bucket")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("2024-01-01 10:00:00", "view", 4L, 1L, -1600L)),
      rows.mkString(","))
  }

  test("cusumBucketStream boundary dev equals the exact cusumStream dev at the same prefix point") {
    // change lands exactly on a bucket boundary: 8 events of cents=100
    // in buckets 0..7 (minute 0..7x4), 8 of cents=500 in buckets 8..15
    // — the exact fold's vertex (position 8) IS a boundary prefix, so
    // the bucket tier must report the identical dev value there.
    val rows = (0 until 16).map { i =>
      val off = i * 225 // exactly one event per 225s bucket
      (i.toLong, i.toLong, "view", if (i < 8) 1.0 else 5.0,
        f"2024-01-01 10:${off / 60}%02d:${off % 60}%02d")
    }
    val b1 = eventsDF(rows)
    val b2 = eventsDF(Seq(
      (99L, 99L, "click", 0.0, "2024-01-01 11:30:00")))
    val dir = stageBatches("cusumb2", Seq(b1, b2))
    val bucketed = Streams.runToBatch(spark,
        Streams.cusumBucketStream(streamDir(dir, b1.schema)),
        "spec_cusum_bucket2")
      .filter(col("series") === "view").collect().head
    val exact = Streams.runToBatch(spark,
        Streams.cusumStream(streamDir(dir, b1.schema)),
        "spec_cusum_exact2", outputMode = "update")
      .filter(col("series") === "view")
      .orderBy(col("n_points").desc).collect().head
    // n=16, total=4800; vertex at k=8: dev = 16*800 - 8*4800 = -25600
    assert(bucketed.getLong(2) == 16L && exact.getLong(2) == 16L)
    assert(bucketed.getLong(3) == 8L,   s"boundary=${bucketed.getLong(3)}")
    assert(exact.getLong(3) == 8L,      s"exact k=${exact.getLong(3)}")
    assert(bucketed.getLong(4) == exact.getLong(5) &&
      bucketed.getLong(4) == -25600L,
      s"bucket dev=${bucketed.getLong(4)} exact dev=${exact.getLong(5)}")
  }

  test("srmStream: hand-built window pins counts, deviation and chi2; unexpected arm counted") {
    // window 10:00 (5-min): control x3 (users 10,20,30 — %10 < 5),
    // treatment x1 (user 7 — %10 >= 5), junk x1 (user 97 — %97 == 0);
    // closed by the 11:00 event
    val b1 = eventsDF(Seq(
      (1L, 10L, "view", 0.0, "2024-01-01 10:00:10"),
      (2L, 20L, "view", 0.0, "2024-01-01 10:01:00"),
      (3L, 30L, "view", 0.0, "2024-01-01 10:02:00"),
      (4L, 7L, "view", 0.0, "2024-01-01 10:03:00"),
      (5L, 97L, "view", 0.0, "2024-01-01 10:04:00")))
    val b2 = eventsDF(Seq((9L, 2L, "view", 0.0, "2024-01-01 11:00:00")))
    val ev = streamDir(stageBatches("srm", Seq(b1, b2)), b1.schema)
      .filter(col("user_id").isNotNull)
      .withColumn("arm", when(col("user_id") % 97 === 0, "junk")
        .when(col("user_id") % 10 < 5, "control")
        .otherwise("treatment"))
    val rows = Streams.runToBatch(spark,
        Streams.srmStream(ev, "arm",
          Seq(("control", 1L), ("treatment", 1L))),
        "spec_srm_stream")
      .orderBy(col("w_start"), col("arm")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(5),
        r.getDouble(6), r.getLong(7)))
    // users 10,20,30 -> %10==0 -> control; user 1 -> treatment;
    // n_assigned=4: control obs 750000 (dev +250000), chi2=(3*2-4)^2/8
    assert(rows.toSeq == Seq(
      ("control", 3L, 250000L, 0.5, 1L),
      ("treatment", 1L, -250000L, 0.5, 1L)), rows.mkString(","))
  }

  test("fingerprintStream: closed window equals the batch fold in any arrival order; a duplicate shifts n/sum but cancels in xor") {
    val rows = Seq(
      (1L, 5L, "view", 1.0, "2024-01-01 10:00:10"),
      (2L, 6L, "click", 2.0, "2024-01-01 10:01:00"),
      (3L, 7L, "view", 3.0, "2024-01-01 10:02:30"))
    val b1 = eventsDF(scala.util.Random.shuffle(rows))
    val b2 = eventsDF(Seq((9L, 9L, "view", 0.0, "2024-01-01 11:00:00")))
    def run(batches: Seq[org.apache.spark.sql.DataFrame], tag: String) = {
      val dir = stageBatches(tag, batches)
      val s = streamDir(dir, batches.head.schema)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      Streams.runToBatch(spark,
          Streams.fingerprintStream(s,
            Seq("event_id", "user_id", "event_type", "cents")),
          s"spec_fp_$tag")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
    }
    val a = run(Seq(b1, b2), "fpa")
    // same rows split across batches in a different order
    val c1 = eventsDF(rows.take(1)); val c2 = eventsDF(rows.drop(1))
    val b = run(Seq(c2, c1, b2), "fpb")
    assert(a.nonEmpty && a == b, s"$a vs $b")
    // duplicate delivery: n_rows grows, sum_h grows, and the dup pair
    // CANCELS in xor (xor becomes the two non-duplicated rows' fold —
    // visibly different from the clean window's xor)
    val dup = run(Seq(b1, eventsDF(rows.take(1)), b2), "fpc")
    assert(dup.head._2 == a.head._2 + 1, s"$dup vs $a")
    assert(dup.head._4 > a.head._4 && dup.head._3 != a.head._3,
      s"$dup vs $a")
  }

  test("quantileStreamBy equals per-series batch histogram quantiles window-for-window") {
    val (lo, hi, nB) = (0.0, 200.0, 16)
    val qs = Seq(0.5, 0.95, 0.99)
    val streamed = Streams.runToBatch(spark,
        Streams.quantileStreamBy(Streams.eventsStream(spark, sfTiny),
          "event_type", lo, hi, nB, qs), "spec_quant_by")
      .orderBy("w_start", "series").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(streamed.nonEmpty)
    val ev = Tables.events(spark, sfTiny)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(concat_ws("|", date_format(window(col("ts"), "5 minutes")
        .getField("start"), "yyyy-MM-dd HH:mm:ss"),
        col("event_type")).as("grp"),
        col("value"))
    val hist = graft.ops.Sketches.histBuildBy(ev, "grp", "value", lo, hi, nB)
    val batchMap = graft.ops.Sketches.histQuantileBy(hist, lo, hi, nB, qs)
      .select(col("grp"), col("q"), col("n"), col("est"))
      .collect()
      .map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    streamed.foreach { case (w, series, n, p50, p95, p99) =>
      qs.zip(Seq(p50, p95, p99)).foreach { case (q, est) =>
        assert(batchMap((s"$w|$series", q)) == ((n, est)),
          s"($w, $series) q$q: streamed ($n, $est) vs " +
            batchMap((s"$w|$series", q)))
      }
    }
  }

  test("quantileStreamBy over a constant series equals quantileStream window-for-window") {
    // keying by a constant partitions nothing: the per-series tier
    // must reproduce the corpus-global monitor exactly (same ladder,
    // same closed windows, same estimates)
    val (lo, hi, nB) = (0.0, 200.0, 16)
    val qs = Seq(0.5, 0.95, 0.99)
    val global = Streams.runToBatch(spark,
        Streams.quantileStream(Streams.eventsStream(spark, sfTiny),
          lo, hi, nB, qs), "spec_qglobal")
      .orderBy("w_start").collect().map(_.toSeq).toSeq
    val keyed = Streams.runToBatch(spark,
        Streams.quantileStreamBy(Streams.eventsStream(spark, sfTiny)
          .withColumn("const", lit("all")),
          "const", lo, hi, nB, qs), "spec_qconst")
      .orderBy("w_start").collect()
      .map(r => r.toSeq.patch(1, Nil, 1)).toSeq // drop the series col
    assert(global.nonEmpty && keyed == global)
  }

  test("kafka source wiring fails ONLY at provider lookup (no connector jar shipped)") {
    // the production path is fully constructed (options, payload decode,
    // projection); this environment has no spark-sql-kafka artifact, so
    // the one acceptable failure is DataSource provider resolution —
    // anything else (analysis of our projection, option typos) would
    // surface as a different error class/message
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    val e = intercept[Exception] {
      Streams.kafkaStream(spark, "broker:9092", "events", schema).isStreaming
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected provider-lookup failure, got: ${e.getMessage.take(200)}")
  }

  test("oovRateStream: known/OOV/null splits against a broadcast vocabulary") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, "view", 0.0, "2024-01-01 10:00:01"),
      (2L, 1L, "click", 0.0, "2024-01-01 10:00:02"),
      (3L, 1L, "newtype", 0.0, "2024-01-01 10:00:03"),
      (4L, 1L, "newtype", 0.0, "2024-01-01 10:00:04"))
    val df = eventsDF(rows)
    val withNull = df.union(Seq((5L, 1L, 0.0))
      .toDF("event_id", "user_id", "value")
      .withColumn("event_type", lit(null).cast("string"))
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:05")))
      .select(df.columns.map(col): _*))
    val ref = Seq("view", "click", "signup").toDF("v")
    val out = Streams.runToBatch(spark,
        Streams.oovRateStream(streamDir(stageBatches("oov", Seq(
          withNull, eventsDF(Seq((99L, 1L, "view", 0.0,
            "2024-01-01 11:00:00"))))), withNull.schema), "event_type", ref),
        "spec_oov")
      .orderBy("w_start").collect()
    assert(out.length == 1)
    val r = out.head
    // 5 rows: 2 known, 2 OOV, 1 null -> oov_bp = 20000 div 5 = 4000
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((5L, 2L, 2L, 1L, 4000L)), r.toString)
  }

  test("zscoreAnomalyStream: frozen-stats integer z, breach count/share, nulls counted not scored") {
    import spark.implicits._
    // frozen mean 100c, std 300c, thresh 2e4 bp (2 sigma = dev 600c):
    // values 1.00 (z 0), 10.00 (dev 900c -> z 30000, breach),
    // -8.00 (dev -900c -> z floor(-9000000/300... ) breach), null
    val rows = Seq(
      (1L, 1L, "view", 1.00, "2024-01-01 10:00:01"),
      (2L, 1L, "view", 10.00, "2024-01-01 10:00:02"),
      (3L, 1L, "view", -8.00, "2024-01-01 10:00:03"))
    val df = eventsDF(rows)
    val withNull = df.union(Seq((4L, 1L, "view"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("value", lit(null).cast("double"))
      .withColumn("ts", to_timestamp(lit("2024-01-01 10:00:04")))
      .select(df.columns.map(col): _*))
    val out = Streams.runToBatch(spark,
        Streams.zscoreAnomalyStream(streamDir(stageBatches("zanom", Seq(
          withNull, eventsDF(Seq((99L, 1L, "view", 1.0,
            "2024-01-01 11:00:00"))))), withNull.schema),
          col("value"), meanC = 100L, stdC = 300L, threshBp = 20000L),
        "spec_zanom")
      .orderBy("w_start").collect()
    assert(out.length == 1)
    val r = out.head
    // z: 0, +30000, floor(-9000000/300) = -30000; 2 breaches of 3
    // scored -> anom_bp = 20000 div 3 = 6666; max|z| = 30000
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((4L, 1L, 2L, 6666L, 30000L)), r.toString)
  }

  test("cusumStreamAtClose: one append row per closed series, equal to the batch fold; open windows stay silent") {
    // window 10:00–11:00 has a mean shift after the 3rd event; the
    // 12:30 event pushes the watermark (12:20) past 11:00 + 10 min so
    // the timer fires exactly once — the 12:00 window never closes
    val rows = Seq(
      (1L, 1L, "view", 1.0, "2024-01-01 10:00:01"),
      (2L, 1L, "view", 1.0, "2024-01-01 10:10:00"),
      (3L, 1L, "view", 1.0, "2024-01-01 10:20:00"),
      (4L, 1L, "view", 9.0, "2024-01-01 10:30:00"))
    val df = eventsDF(rows)
    val out = Streams.runToBatch(spark,
        Streams.cusumStreamAtClose(streamDir(stageBatches("cusumclose", Seq(
          df, eventsDF(Seq((99L, 1L, "view", 5.0,
            "2024-01-01 12:30:00"))))), df.schema)),
        "spec_cusum_close")
      .orderBy("w_start").collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    // n=4, total=1200 cents: dev_k = 4*prefix - 1200k -> max |dev| at
    // k=3 (dev -2400), vertex at the 3rd event's timestamp
    assert(r.getString(0) == "2024-01-01 10:00:00")
    assert(r.getString(1) == "view")
    assert((r.getLong(2), r.getLong(3), r.getLong(5)) == ((4L, 3L, -2400L)),
      r.toString)
  }

  test("eceStream: hand-built window pins integer ECE and the worst-bin tie-break") {
    import org.apache.spark.sql.functions._
    // bin 9: scores 0.95/0.95, one positive -> pred 9500 bp, obs 5000,
    // gap 4500; bin 0: scores 0.05/0.05, one positive -> pred 500, obs
    // 5000, gap 4500. ECE = 4500; equal gaps tie-break to the LOWEST bin
    val rows = Seq(
      (1L, 1L, "purchase", 190.0, "2024-01-01 10:00:01"),
      (2L, 1L, "view", 190.0, "2024-01-01 10:00:02"),
      (3L, 1L, "view", 10.0, "2024-01-01 10:00:03"),
      (4L, 1L, "purchase", 10.0, "2024-01-01 10:00:04"))
    val df = eventsDF(rows)
    val out = Streams.runToBatch(spark,
        Streams.eceStream(
          streamDir(stageBatches("ece", Seq(
            df, eventsDF(Seq((99L, 1L, "view", 50.0,
              "2024-01-01 11:00:00"))))), df.schema),
          least(greatest(col("value") / 200.0, lit(0.0)), lit(1.0)),
          (col("event_type") === "purchase").cast("long")),
        "spec_ece")
      .orderBy("w_start").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "2024-01-01 10:00:00")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((4L, 0L, 4500L, 4500L, 0L)),
      out.head.toString)
  }

  test("quantileMapStream: identity on reference-shaped windows, shift corrected") {
    import org.apache.spark.sql.functions._
    // ladder [0, 100), 4 buckets of width 25; reference mass
    // (2, 2, 2, 2) -> cumRef (2, 4, 6, 8). Window values 60/60/85/85
    // (buckets 2, 2, 3, 3): cume(2)=2, cume(3)=4, n=4.
    //   bucket 2: min rb with cumRef(rb)*4 >= 2*8=16 -> rb=1 (cum 4)
    //   bucket 3: min rb with cumRef(rb)*4 >= 4*8=32 -> rb=3 (cum 8)
    // i.e. the upshifted low mass maps DOWN a bucket, the tail stays.
    val rows = Seq(
      (1L, 1L, "purchase", 60.0, "2024-01-01 10:00:01"),
      (2L, 1L, "purchase", 60.0, "2024-01-01 10:00:02"),
      (3L, 1L, "purchase", 85.0, "2024-01-01 10:00:03"),
      (4L, 1L, "purchase", 85.0, "2024-01-01 10:00:04"))
    val df = eventsDF(rows)
    val out = Streams.runToBatch(spark,
        Streams.quantileMapStream(
          streamDir(stageBatches("qmap", Seq(
            df, eventsDF(Seq((99L, 1L, "view", 50.0,
              "2024-01-01 11:00:00"))))), df.schema),
          refCounts = Seq(2L, 2L, 2L, 2L), lo = 0.0, hi = 100.0,
          nBuckets = 4),
        "spec_qmap")
      .orderBy("w_start", "bucket").collect()
    assert(out.length == 2, out.mkString("; "))
    val byBucket = out.map(r => r.getInt(2) ->
      ((r.getLong(3), r.getLong(4), r.getInt(5), r.getDouble(6)))).toMap
    assert(byBucket(2) == ((2L, 2L, 1, 37.5)), byBucket)
    assert(byBucket(3) == ((2L, 4L, 3, 87.5)), byBucket)
    // identity check: a window drawn in reference proportions maps
    // every bucket to itself
    val even = eventsDF(Seq(
      (11L, 1L, "purchase", 10.0, "2024-01-02 10:00:01"),
      (12L, 1L, "purchase", 30.0, "2024-01-02 10:00:02"),
      (13L, 1L, "purchase", 60.0, "2024-01-02 10:00:03"),
      (14L, 1L, "purchase", 85.0, "2024-01-02 10:00:04")))
    val out2 = Streams.runToBatch(spark,
        Streams.quantileMapStream(
          streamDir(stageBatches("qmap2", Seq(
            even, eventsDF(Seq((99L, 1L, "view", 50.0,
              "2024-01-02 11:00:00"))))), even.schema),
          refCounts = Seq(2L, 2L, 2L, 2L), lo = 0.0, hi = 100.0,
          nBuckets = 4),
        "spec_qmap2")
      .collect()
    assert(out2.length == 4)
    assert(out2.forall(r => r.getInt(2) == r.getInt(5)), out2.mkString("; "))
  }

  test("benfordStream: all-digit-1 window pins d1_bp and the deviation sum") {
    val exp = graft.ops.Validate.benfordExpBp
    val rows = (1 to 20).map(i => (i.toLong, 1L, "view",
      if (i % 2 == 0) 12.5 else 180.0, f"2024-01-01 10:00:${i % 60}%02d"))
    val df = eventsDF(rows)
    val out = Streams.runToBatch(spark,
        Streams.benfordStream(streamDir(stageBatches("benford", Seq(
          df, eventsDF(Seq((99L, 1L, "view", 50.0,
            "2024-01-01 11:00:00"))))), df.schema)),
        "spec_benford")
      .orderBy("w_start").collect()
    // only the 10:00 window is closed by the 11:00 event's watermark
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 20L && r.getLong(2) == 0L) // n_valid, excluded
    assert(r.getLong(3) == 10000L)                    // every value digit 1
    val wantDev = (10000L - exp.head) + exp.tail.sum
    assert(r.getLong(4) == wantDev, s"dev=${r.getLong(4)} want=$wantDev")
  }

  test("fkOrphanStream: hand-built windows pin null/dangling splits") {
    import spark.implicits._
    // window 10:00: users 1 (in dim), 4 (dangling), null; a late event
    // at 10:30 closes it. dim = {1, 2}
    val rows = Seq(
      (1L, 1L, "view", 0.0, "2024-01-01 10:00:10"),
      (2L, 4L, "view", 0.0, "2024-01-01 10:01:00"),
      (4L, 1L, "view", 0.0, "2024-01-01 10:30:00"))
    val withNull = eventsDF(rows)
      .union(Seq((3L, Option.empty[Long], "view", 0.0))
        .toDF("event_id", "user_id", "event_type", "value")
        .withColumn("ts", to_timestamp(lit("2024-01-01 10:02:00"))))
    val dim = Seq(1L, 2L).toDF("uid")
    val out = Streams.runToBatch(spark,
        Streams.fkOrphanStream(streamDir(stageBatches("fkorph",
          Seq(withNull)), withNull.schema), dim, "user_id", "uid"),
        "spec_fk_orph")
      .orderBy("w_start").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 1L, 1L, 3333L)), r.toString)
  }

  test("buffered-fold state caps fail fast (funnelStream, cusumStream)") {
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    // 17 funnel events for one user, all above the watermark -> the
    // 16-event buffer cap must abort loudly, not silently drop
    val many = eventsDF((1 to 17).map(i =>
      (i.toLong, 1L, "view", 0.0, f"2024-01-01 10:00:${i % 60}%02d")))
    val e1 = intercept[Exception] {
      Streams.runToBatch(spark,
        Streams.funnelStream(streamDir(stageBatches("fcap", Seq(many)),
          many.schema), Seq("view", "click"), maxBufferedEvents = 16),
        "spec_funnel_cap", outputMode = "update").collect()
    }
    assert(msgs(e1).exists(_.contains("maxBufferedEvents")), e1.getMessage)
    val e2 = intercept[Exception] {
      Streams.runToBatch(spark,
        Streams.cusumStream(streamDir(stageBatches("ccap", Seq(many)),
          many.schema), maxBufferedEvents = 3),
        "spec_cusum_cap", outputMode = "update").collect()
    }
    assert(msgs(e2).exists(_.contains("maxBufferedEvents")), e2.getMessage)
  }

  test("seasonalBaselineStream: hand profile pins residual and anomaly flag") {
    import org.apache.spark.sql.functions._
    // profile: phase p baseline = 1000 + p cents; with hourly
    // buckets the phase slot % 24 IS the UTC hour -> 10, base 1010.
    // Window mean = (20 + 30)/2 dollars = 2500 cents -> resid 1490
    // > 800 -> anomaly.
    val rows = Seq(
      (1L, 1L, "purchase", 20.0, "2024-01-01 10:10:00"),
      (2L, 1L, "purchase", 30.0, "2024-01-01 10:20:00"))
    val df = eventsDF(rows)
    val profile = (0 until 24).map(p => 1000L + p)
    val out = Streams.runToBatch(spark,
        Streams.seasonalBaselineStream(
          streamDir(stageBatches("seas", Seq(
            df, eventsDF(Seq((99L, 1L, "view", 5.0,
              "2024-01-01 13:00:00"))))), df.schema),
          profile, thresholdCents = 800L),
        "spec_seas")
      .collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getString(0) == "2024-01-01 10:00:00")
    assert(r.getLong(1) == 2L && r.getLong(2) == 2500L, r.toString)
    assert(r.getLong(3) == 1010L && r.getLong(4) == 1490L, r.toString)
    assert(r.getBoolean(5), r.toString)
  }
}
