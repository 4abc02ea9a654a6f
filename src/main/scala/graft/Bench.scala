package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every gated query at SPARK_GRAFT_SF_DIR, one
  * JSON line. Session mirrors Engine.session (AQE + broadcast threshold
  * + right-sized shuffle partitions — SURVEY §6 perf levers).
  *
  * Materialization is `toRdd.foreach`, not `count()`: count() lets
  * Catalyst prune projected columns, which would skip the expensive
  * expressions (minhash/simhash/dot products) a query exists to measure.
  *
  * The final JSON line MUST stay under ~1900 chars: the driver parses it
  * from the last 2000 chars of stdout (sbt appends ~65 chars of
  * "[success] ..." after us), and round 1's 4 KB line was truncated →
  * BENCH_r01 "parsed": null. So the queries map uses the short unique
  * query prefix (q01, q92b — COVERAGE.md maps prefixes to operators)
  * with millisecond precision; full names go to per-line stdout and
  * BENCH_FULL.json. Round 2 failed on FRAMING instead: sbt's LoggedOutput
  * prefixed the line with "[info] " — build.sbt now forces StdoutOutput,
  * and we re-print the line after spark.stop() so it is the very last
  * thing on stdout even if Spark shutdown chatter intervenes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // typed-UDAF aggs (HyperBall RegMax) stay on the hash path
      // instead of sorting wide buffer rows (see Engine.session)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen/parquet-reader warmup outside the timed loop
    spark.range(1000000).selectExpr("sum(id)").queryExecution.toRdd.foreach(_ => ())
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().queryExecution.toRdd.foreach(_ => ())
    // JIT-warm the text UDFs + custom hash expressions on a 50-doc
    // sample: measured ~2 s of first-call classload/JIT otherwise lands
    // in whichever text query happens to run first (lexically q100)
    locally {
      import org.apache.spark.sql.functions._
      val doc50 = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      doc50.select(
          graft.ops.TextAnalysis.langIdCol(col("text")),
          graft.ops.TextAnalysis.tokenNgrams(col("text"), 3),
          graft.expressions.TextHashes.minhash_sig(col("text"), 5, 16),
          graft.expressions.TextHashes.simhash32(col("text")))
        .queryExecution.toRdd.foreach(_ => ())
    }
    // local-iteration filter, same contract as Verify's; driver runs unset
    val only = sys.env.get("GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // FROZEN bench canary (round-11 protocol): ~20 queries spanning the
    // catalog (joins/aggs, windows, text, dedup/LSH, ANN, streaming,
    // graph, sketches, corpus). GRAFT_BENCH_CANARY=1 runs ONLY this set,
    // min-of-3 by default. Run it at round OPEN and CLOSE and record
    // both tables in PLANS.md: an A/A delta on untouched canaries makes
    // "environment offset vs real regression" decidable without a judge
    // rerun (the r10 driver pair read +17% on untouched queries purely
    // from machine state). Do NOT edit this set without a PLANS.md note
    // — its value is comparability across rounds.
    val canarySet: Set[String] = Set(
      "q01b", "q18b", "q23b", "q35", "q71h", "q77d", "q92c", "q95b",
      "q96", "q99d", "q110", "q119", "q145", "q151e", "q154b", "q162b",
      "q171", "q180", "q209b", "q216b", "q218", "q221")
    val isCanary = sys.env.get("GRAFT_BENCH_CANARY").contains("1")
    // GRAFT_BENCH_REVERSE=1 runs the catalog in reverse name order — an
    // A/B diagnostic for shared-session position effects (JIT/GC drift):
    // a query whose time moves with its POSITION is not a regression
    val ordered0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered = if (sys.env.get("GRAFT_BENCH_REVERSE").contains("1"))
      ordered0.reverse else ordered0
    val sel = ordered
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .filter { case (name, _) =>
        !isCanary || canarySet.contains(name.takeWhile(_ != '_')) }
    // Position noise in the shared JVM is proven at up to 7x on this
    // catalog (PLANS.md order-flip A/B), so a single run per query is
    // not a measurement. Default: TWO passes, the second in reverse
    // catalog order (each query sees both a "cold neighborhood" and a
    // "warm" one), report the per-query MIN — position effects cancel
    // instead of masquerading as regressions. Each pass calls fn()
    // fresh, so plans (and their exchanges) are rebuilt, never reused.
    // GRAFT_BENCH_PASSES=1 restores the quick single-pass mode.
    // Canary mode defaults to min-of-3 (odd passes end forward-order).
    val passes = sys.env.getOrElse("GRAFT_BENCH_PASSES",
      if (isCanary) "3" else "2").toInt
    // Shared-JVM interference purge (round-8): iterative ops release
    // their persist/localCheckpoint blocks via GC-driven ContextCleaner
    // weak references, and a long bench JVM with a large heap collects
    // them late — r7 measured the checkpoint-heavy q92 family at 2–4x
    // its solo time purely from accumulated block-manager state. After
    // each query, drop every leaked cache entry deterministically, and
    // nudge a full GC every 16 queries so the cleaner actually runs.
    // The purge happens OUTSIDE the timed section: per-query numbers
    // measure the query, the purge is the harness's isolation cost.
    var sinceGc = 0
    def purge(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      sinceGc += 1
      if (sinceGc >= 16) { sinceGc = 0; System.gc() }
    }
    // A crashed query must be VISIBLE: it benches at its failure time,
    // is named on stderr, and lands in the JSON "errors" field — a
    // silent catch would report a broken query as a ~0 s "win" and let
    // bench diverge from correctness (r8 verdict item 5).
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def runPass(order: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
        tag: String): Seq[(String, Double)] = order.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()) }
      catch { case e: Throwable =>
        errors(name) = e.getClass.getSimpleName
        System.err.println(s"[bench] ERROR $tag $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      purge()
      println(f"[bench] $tag $name%-28s ${sec}%9.3f s")
      name -> sec
    }
    // N passes alternating forward/reverse order, per-query MIN across
    // passes — position effects in the shared JVM cancel instead of
    // masquerading as regressions.
    val passRuns = (1 to passes).map { i =>
      val order = if (i % 2 == 0) sel.reverse else sel
      runPass(order, s"p$i").toMap
    }
    val results = sel.map { case (n, _) => n -> passRuns.map(_(n)).min }
    val total = results.map(_._2).sum
    def line(rs: Seq[(String, Double)], short: Boolean, dec: Int): String = {
      val qs = rs.map { case (k, v) =>
        val key = if (short) k.takeWhile(_ != '_') else k
        "\"" + key + "\":" + s"%.${dec}f".format(v)
      }.mkString("{", ",", "}")
      val errs = errors.keys.map(k =>
        "\"" + (if (short) k.takeWhile(_ != '_') else k) + "\"").mkString("[", ",", "]")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    }
    // full-name copy for humans/judge; short-key line for the driver tail
    // (canary runs get their own file so the full-catalog artifact is
    // never clobbered by a 20-query subset)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        if (isCanary) "BENCH_CANARY.json" else "BENCH_FULL.json"),
      line(results, short = false, dec = 3) + "\n")
    val shortOk = { val ks = results.map(_._1.takeWhile(_ != '_')); ks.distinct.size == ks.size }
    // degrade gracefully toward the 1900-char budget: 3 → 2 decimals,
    // then keep only the slowest queries that fit — the total always
    // stays; a too-long line is parsed as NOTHING by the driver
    val budget = 1900
    val out = Seq(line(results, shortOk, 3), line(results, shortOk, 2))
      .find(_.length <= budget)
      .getOrElse {
        var kept = results.sortBy(-_._2)
        while (line(kept.sortBy(_._1), shortOk, 2).length > budget && kept.nonEmpty)
          kept = kept.dropRight(1)
        line(kept.sortBy(_._1), shortOk, 2)
      }
    println(out)
    spark.stop()
    println(out)
    System.out.flush()
  }
}
